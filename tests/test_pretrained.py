"""Pretrained-weight conversion: torch state-dict -> npz -> flax encoder."""

import numpy as np
import pytest

from ips_tpu.models.encoders import ConvPatchEncoder
from ips_tpu.models.pretrained import (load_encoder_npz, save_npz,
                                       torch_resnet_to_flat,
                                       torchvision_manifest,
                                       verify_torchvision_state_dict)


def _fake_resnet_state(rng, enc_type="resnet18"):
    """Random FULL-schema torchvision-named state dict (numpy tensors):
    every key a real downloaded checkpoint has, with its exact shape —
    built from the manifest, so conversion exercises the same coverage a
    genuine ``ResNet18_Weights.IMAGENET1K_V1`` file would."""
    sd = {}
    for key, shape in torchvision_manifest(enc_type).items():
        if key.endswith("num_batches_tracked"):
            sd[key] = np.array(100, dtype=np.int64)
        elif key.endswith("running_var"):
            sd[key] = np.abs(rng.normal(1, 0.1, shape)).astype(np.float32)
        else:
            sd[key] = rng.normal(0, 0.1, shape).astype(np.float32)
    return sd


def _fake_resnet18_state(rng):
    return _fake_resnet_state(rng, "resnet18")


def test_convert_and_load(tmp_path):
    rng = np.random.default_rng(0)
    sd = _fake_resnet18_state(rng)
    flat = torch_resnet_to_flat(sd, "resnet18")

    # kernel layout OIHW -> HWIO
    np.testing.assert_allclose(
        flat["params/conv1/kernel"],
        sd["conv1.weight"].transpose(2, 3, 1, 0))
    assert "params/layer2_block0/downsample_conv/kernel" in flat
    assert "batch_stats/layer4_block1/bn2/var" in flat

    npz = str(tmp_path / "w.npz")
    save_npz(npz, flat)

    import jax
    import jax.numpy as jnp
    m = ConvPatchEncoder(enc_type="resnet18", n_chan_in=3, n_res_blocks=2)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    before = np.asarray(m.apply(variables, x, train=False))

    loaded = load_encoder_npz(npz, variables)
    after = np.asarray(m.apply(loaded, x, train=False))
    assert not np.allclose(before, after)
    # loaded kernel actually present in the merged tree
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["conv1"]["kernel"]),
        sd["conv1.weight"].transpose(2, 3, 1, 0), rtol=1e-6)
    # bn running stats landed in batch_stats
    np.testing.assert_allclose(
        np.asarray(loaded["batch_stats"]["bn1"]["mean"]),
        sd["bn1.running_mean"], rtol=1e-6)


def test_load_shape_mismatch_raises(tmp_path):
    rng = np.random.default_rng(1)
    sd = _fake_resnet18_state(rng)
    flat = torch_resnet_to_flat(sd, "resnet18")
    npz = str(tmp_path / "w.npz")
    save_npz(npz, flat)

    import jax
    import jax.numpy as jnp
    # 1-channel stem: conv1 shape differs -> must raise, not silently load
    m = ConvPatchEncoder(enc_type="resnet18", n_chan_in=1, n_res_blocks=2)
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 32, 32, 1)), train=False)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_encoder_npz(npz, variables)


def test_no_matching_keys_raises(tmp_path):
    npz = str(tmp_path / "w.npz")
    np.savez(npz, **{"params/bogus/kernel": np.zeros((3, 3))})
    import jax
    import jax.numpy as jnp
    m = ConvPatchEncoder(enc_type="resnet18", n_chan_in=3, n_res_blocks=2)
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 32, 32, 3)), train=False)
    with pytest.raises(ValueError, match="no keys"):
        load_encoder_npz(npz, variables)


class TestSchema:
    """Full torchvision key+shape manifest validation (VERDICT r3 #6)."""

    @pytest.mark.parametrize("enc_type", ["resnet18", "resnet50"])
    def test_full_schema_passes(self, enc_type):
        sd = _fake_resnet_state(np.random.default_rng(0), enc_type)
        verify_torchvision_state_dict(sd, enc_type)  # no raise
        flat = torch_resnet_to_flat(sd, enc_type, verify="full")
        assert "params/conv1/kernel" in flat
        # resnet50 layer1 has a stride-1 downsample (64 -> 256)
        if enc_type == "resnet50":
            assert "params/layer1_block0/downsample_conv/kernel" in flat

    def test_manifest_counts(self):
        # torchvision resnet18 has 122 entries, resnet50 has 320
        assert len(torchvision_manifest("resnet18")) == 122
        assert len(torchvision_manifest("resnet50")) == 320

    def test_missing_key_fails_full(self):
        sd = _fake_resnet_state(np.random.default_rng(0))
        del sd["layer2.1.conv2.weight"]
        with pytest.raises(ValueError, match="missing.*layer2.1.conv2"):
            torch_resnet_to_flat(sd, "resnet18", verify="full")
        # a PARTIALLY present block is refused even in truncated mode
        with pytest.raises(ValueError, match="partially present"):
            torch_resnet_to_flat(sd, "resnet18", verify="truncated")
        # truncated mode tolerates WHOLLY absent trailing stages
        for k in list(sd):
            if k.startswith(("layer3.", "layer4.", "fc.")):
                del sd[k]
        for k in list(sd):
            if k.startswith("layer2.1."):
                del sd[k]
        flat = torch_resnet_to_flat(sd, "resnet18", verify="truncated")
        assert "params/layer2_block0/conv1/kernel" in flat
        assert not any(k.startswith("params/layer3") for k in flat)

    def test_unexpected_key_fails(self):
        sd = _fake_resnet_state(np.random.default_rng(0))
        sd["module.backbone.junk"] = np.zeros((3,), np.float32)
        with pytest.raises(ValueError, match="unexpected"):
            torch_resnet_to_flat(sd, "resnet18", verify="truncated")

    def test_wrong_shape_fails(self):
        sd = _fake_resnet_state(np.random.default_rng(0))
        sd["layer1.0.conv1.weight"] = np.zeros((64, 64, 5, 5), np.float32)
        with pytest.raises(ValueError, match="shape mismatches"):
            torch_resnet_to_flat(sd, "resnet18", verify="truncated")


class TestCoverage:
    """expect_cover / skip_keys loading semantics."""

    def _encoder_vars(self, n_chan_in=3, n_res_blocks=2):
        import jax
        import jax.numpy as jnp
        m = ConvPatchEncoder(enc_type="resnet18", n_chan_in=n_chan_in,
                             n_res_blocks=n_res_blocks)
        return m, m.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, n_chan_in)), train=False)

    def test_partial_npz_fails_cover(self, tmp_path):
        sd = _fake_resnet_state(np.random.default_rng(0))
        # drop one block entirely: the converter skips it, the load must
        # then refuse to train from half-random init
        for k in list(sd):
            if k.startswith("layer2.1."):
                del sd[k]
        npz = str(tmp_path / "w.npz")
        save_npz(npz, torch_resnet_to_flat(sd, "resnet18",
                                           verify="truncated"))
        _, variables = self._encoder_vars()
        with pytest.raises(ValueError, match="not covered"):
            load_encoder_npz(npz, variables, expect_cover=True)
        # without the coverage requirement it still loads what matched
        load_encoder_npz(npz, variables)

    def test_stem_skip_with_cover(self, tmp_path):
        """1-channel stem: the one legitimate reinit (reference
        ips_net.py:29-31) is an explicit skip, everything else must
        load — the exact semantics IPSTrainer uses."""
        sd = _fake_resnet_state(np.random.default_rng(0))
        npz = str(tmp_path / "w.npz")
        save_npz(npz, torch_resnet_to_flat(sd, "resnet18", verify="full"))
        _, variables = self._encoder_vars(n_chan_in=1)
        loaded = load_encoder_npz(npz, variables,
                                  skip_keys=("params/conv1/kernel",),
                                  expect_cover=True)
        np.testing.assert_allclose(
            np.asarray(loaded["params"]["conv1"]["kernel"]),
            np.asarray(variables["params"]["conv1"]["kernel"]))
        np.testing.assert_allclose(
            np.asarray(loaded["params"]["layer1_block0"]["conv1"]["kernel"]),
            sd["layer1.0.conv1.weight"].transpose(2, 3, 1, 0), rtol=1e-6)
        # bn1 (kept by the reference's stem swap) DID load
        np.testing.assert_allclose(
            np.asarray(loaded["batch_stats"]["bn1"]["mean"]),
            sd["bn1.running_mean"], rtol=1e-6)

    def test_full_depth_encoder_covered(self, tmp_path):
        """n_res_blocks=4 (reference ips_net.py:44-48): a full checkpoint
        covers the whole truncated-at-layer4 encoder."""
        sd = _fake_resnet_state(np.random.default_rng(1))
        npz = str(tmp_path / "w.npz")
        save_npz(npz, torch_resnet_to_flat(sd, "resnet18", verify="full"))
        import jax.numpy as jnp
        m, variables = self._encoder_vars(n_res_blocks=4)
        loaded = load_encoder_npz(npz, variables, expect_cover=True)
        np.testing.assert_allclose(
            np.asarray(loaded["params"]["layer4_block1"]["conv2"]["kernel"]),
            sd["layer4.1.conv2.weight"].transpose(2, 3, 1, 0), rtol=1e-6)
        out = m.apply(loaded, jnp.zeros((2, 32, 32, 3)), train=False)
        assert out.shape == (2, 512) and np.isfinite(np.asarray(out)).all()


def test_mismatch_skip_keeps_init(tmp_path):
    rng = np.random.default_rng(2)
    sd = _fake_resnet18_state(rng)
    npz = str(tmp_path / "w.npz")
    save_npz(npz, torch_resnet_to_flat(sd, "resnet18"))

    import jax
    import jax.numpy as jnp
    m = ConvPatchEncoder(enc_type="resnet18", n_chan_in=1, n_res_blocks=2)
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 32, 32, 1)), train=False)
    loaded = load_encoder_npz(npz, variables, on_mismatch="skip")
    # stem kept its init (shape differs), deeper layers loaded
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["conv1"]["kernel"]),
        np.asarray(variables["params"]["conv1"]["kernel"]))
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["layer1_block0"]["conv1"]["kernel"]),
        sd["layer1.0.conv1.weight"].transpose(2, 3, 1, 0), rtol=1e-6)
