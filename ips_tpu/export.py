"""AOT serving export: serialize the inference pipeline with jax.export.

The reference has no inference path at all (SURVEY.md §5 — training
prints metrics and exits); ips_tpu adds a live Predictor (ips_tpu/infer.py)
and, here, an ahead-of-time export of it: the full selection + aggregate
+ heads pipeline — with the trained weights baked in as constants — is
lowered to StableHLO once and serialized to a single self-contained
artifact. A serving process deserializes and calls it WITHOUT the model
code, the config, or the checkpoint (jax.export guarantees forward
compatibility for serialized artifacts), and an artifact exported with
``--platforms cpu,tpu`` runs on either backend.

    # export (after training)
    python -m ips_tpu.export --config config/mnist_config.yml \
        --checkpoint ckpts/ --output model.ipsx --batch 8

    # serve
    from ips_tpu.export import ExportedPredictor
    model = ExportedPredictor.load("model.ipsx")
    out = model.predict(patches)            # {task: probs, selected_idx}
"""

from __future__ import annotations

import argparse
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from ips_tpu.config import Config, load_config


def _input_specs(conf: Config, batch_size: int, n_patches: int):
    """ShapeDtypeStructs of the serving inputs (patches, mask)."""
    if conf.is_image:
        ph, pw = conf.patch_size
        patches = jax.ShapeDtypeStruct(
            (batch_size, n_patches, ph, pw, conf.n_chan_in), jnp.float32)
    else:
        patches = jax.ShapeDtypeStruct(
            (batch_size, n_patches, conf.n_chan_in), jnp.float32)
    mask = jax.ShapeDtypeStruct((batch_size, n_patches), jnp.bool_)
    return patches, mask


def export_predictor(predictor, batch_size: int,
                     n_patches: Optional[int] = None,
                     platforms: Optional[Sequence[str]] = None
                     ) -> jax_export.Exported:
    """AOT-export a Predictor's jitted pipeline at a fixed input shape.

    The trainer state (params + batch stats) is closed over, so the
    exported artifact is self-contained. Returns a jax.export.Exported;
    call ``.serialize()`` for the persistable bytes.
    """
    conf = predictor.conf
    n = n_patches or conf.N
    if not n:
        raise ValueError("n_patches is required when conf.N is 0 "
                         "(feature mode): pass the padded slide length")
    state = predictor.trainer.state
    params, batch_stats = state.params, state.batch_stats

    def serve(patches, mask):
        preds, mem_idx = predictor._predict_impl(params, batch_stats,
                                                 patches, mask)
        preds = dict(preds)
        preds["selected_idx"] = mem_idx
        return preds

    specs = _input_specs(conf, batch_size, n)
    return jax_export.export(jax.jit(serve), platforms=platforms)(*specs)


class ExportedPredictor:
    """Serving wrapper over a deserialized artifact (no model code)."""

    def __init__(self, exported: jax_export.Exported):
        self.exported = exported
        self._patches_spec = exported.in_avals[0]

    @classmethod
    def load(cls, path: str) -> "ExportedPredictor":
        with open(path, "rb") as f:
            return cls(jax_export.deserialize(bytearray(f.read())))

    @property
    def batch_size(self) -> int:
        return self._patches_spec.shape[0]

    @property
    def n_patches(self) -> int:
        return self._patches_spec.shape[1]

    def predict(self, patches: np.ndarray,
                mask: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        patches = jnp.asarray(patches, jnp.float32)
        if patches.shape != self._patches_spec.shape:
            raise ValueError(
                f"exported for input {self._patches_spec.shape}, got "
                f"{patches.shape} — re-export with matching --batch/"
                "--n-patches or pad the batch")
        m = (jnp.asarray(mask, bool) if mask is not None
             else jnp.ones(patches.shape[:2], bool))
        out = self.exported.call(patches, m)
        return {k: np.asarray(v) for k, v in out.items()}


def main(argv=None):
    p = argparse.ArgumentParser(description="AOT-export the IPS predictor")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--batch", type=int, required=True,
                   help="serving batch size (static shape)")
    p.add_argument("--n-patches", type=int, default=0,
                   help="patches per input (default: conf.N)")
    p.add_argument("--platforms", default="",
                   help="comma-separated subset of cpu,tpu,cuda "
                        "(default: the current backend)")
    p.add_argument("--selftest", action="store_true",
                   help="deserialize the artifact and check it against "
                        "the live predictor on random inputs")
    p.add_argument("overrides", nargs="*")
    a = p.parse_args(argv)

    from ips_tpu.infer import Predictor
    conf = load_config(a.config, a.overrides)
    predictor = Predictor(conf, checkpoint_dir=a.checkpoint)
    platforms = ([s.strip() for s in a.platforms.split(",") if s.strip()]
                 or None)
    exported = export_predictor(predictor, a.batch,
                                a.n_patches or None, platforms)
    blob = exported.serialize()
    with open(a.output, "wb") as f:
        f.write(blob)
    print(f"wrote {a.output} ({len(blob) / 1e6:.1f} MB, "
          f"input {exported.in_avals[0].shape}, "
          f"platforms {list(exported.platforms)})")

    if a.selftest:
        model = ExportedPredictor.load(a.output)
        rng = np.random.default_rng(0)
        patches = rng.normal(
            0, 1, model._patches_spec.shape).astype(np.float32)
        out = model.predict(patches)
        live = predictor.predict(patches)
        for k, v in out.items():
            ref = live["selected_idx"] if k == "selected_idx" else live[k]
            np.testing.assert_allclose(v, np.asarray(ref), rtol=0, atol=1e-5)
        print(f"selftest ok: {sorted(out)} match the live predictor")


if __name__ == "__main__":
    main()
