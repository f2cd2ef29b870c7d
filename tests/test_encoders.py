"""Encoder shape/semantics tests (truncated ResNet + projector)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ips_tpu.models.encoders import (ConvPatchEncoder, FeatureProjector,
                                     encoder_out_dim)


@pytest.mark.parametrize("enc_type,n_blocks,expect_d", [
    ("resnet18", 2, 128), ("resnet18", 4, 512),
    ("resnet50", 2, 512), ("resnet50", 4, 2048),
])
def test_out_dims(enc_type, n_blocks, expect_d):
    assert encoder_out_dim(enc_type, n_blocks) == expect_d
    m = ConvPatchEncoder(enc_type=enc_type, n_chan_in=1, n_res_blocks=n_blocks)
    x = jnp.zeros((2, 32, 32, 1))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (2, expect_d)


def test_batch_stats_update_only_in_train():
    m = ConvPatchEncoder(enc_type="resnet18", n_chan_in=1, n_res_blocks=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 1))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    bs0 = variables["batch_stats"]

    # eval: no mutable collection requested, stats unchanged by construction
    y_eval = m.apply(variables, x, train=False)
    # train: stats move toward the batch statistics
    y_train, mutated = m.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    changed = jax.tree_util.tree_reduce(
        lambda acc, ab: acc or not np.allclose(ab[0], ab[1]),
        jax.tree.map(lambda a, b: (np.asarray(a), np.asarray(b)),
                     bs0, mutated["batch_stats"]),
        False, is_leaf=lambda v: isinstance(v, tuple))
    assert changed
    assert not np.allclose(np.asarray(y_eval), np.asarray(y_train))


def test_projector_shapes_and_relu():
    m = FeatureProjector(n_chan_in=64, D=32)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 64))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (8, 32)
    assert (np.asarray(y) >= 0).all()          # ReLU output
    # layernorm in the projector has no learnable affine
    assert "ln" not in variables["params"]


def test_projector_train_uses_batch_stats():
    m = FeatureProjector(n_chan_in=16, D=8)
    x = jax.random.normal(jax.random.PRNGKey(3), (32, 16)) * 5 + 3
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y_train, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
    # with batch-stat normalization, pre-ReLU activations are standardized;
    # eval mode with init stats (mean 0, var 1) is not
    y_eval = m.apply(variables, x, train=False)
    assert not np.allclose(np.asarray(y_train), np.asarray(y_eval))


def test_stem_downsampling():
    # 7x7/2 stem + 3x3/2 maxpool + layer2 stride 2 => 32x32 -> 4x4 before pool
    m = ConvPatchEncoder(enc_type="resnet18", n_chan_in=3, n_res_blocks=2)
    x = jnp.zeros((1, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (1, 128)


class TestStemS2D:
    """Space-to-depth stem must be numerically identical to the 7x7/s2 conv."""

    @pytest.mark.parametrize("H,W,C", [(50, 50, 1), (32, 48, 3), (224, 224, 3)])
    def test_exact_equivalence(self, H, W, C):
        from ips_tpu.models.encoders import StemConv
        x = jax.random.normal(jax.random.PRNGKey(0), (3, H, W, C))
        std = StemConv(n_chan_in=C, s2d=False)
        s2d = StemConv(n_chan_in=C, s2d=True)
        v = std.init(jax.random.PRNGKey(1), x)
        a = np.asarray(std.apply(v, x))
        b = np.asarray(s2d.apply(v, x))       # same params, s2d math
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)

    def test_odd_size_falls_back(self):
        from ips_tpu.models.encoders import StemConv
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 33, 33, 1))
        s2d = StemConv(n_chan_in=1, s2d=True)
        v = s2d.init(jax.random.PRNGKey(1), x)
        out = s2d.apply(v, x)                 # standard path, no crash
        assert out.shape[-1] == 64

    def test_encoder_with_s2d_same_params_tree(self):
        m1 = ConvPatchEncoder(enc_type="resnet18", n_chan_in=1,
                              n_res_blocks=2, s2d_stem=False)
        m2 = ConvPatchEncoder(enc_type="resnet18", n_chan_in=1,
                              n_res_blocks=2, s2d_stem=True)
        x = jnp.zeros((2, 16, 16, 1))
        v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
        v2 = m2.init(jax.random.PRNGKey(0), x, train=False)
        assert jax.tree_util.tree_structure(v1) == \
            jax.tree_util.tree_structure(v2)
        y1 = np.asarray(m1.apply(v1, x, train=False))
        y2 = np.asarray(m2.apply(v1, x, train=False))  # v1 params in s2d
        np.testing.assert_allclose(y2, y1, rtol=1e-4, atol=1e-5)


class TestLNFold:
    """The LN->GEMM fold (FeatureProjector ln_fold=True) must share the
    exact param tree/init values with the nn.Dense path and agree with it
    numerically (it removes the bf16 rounding of the normalized rows, so
    agreement is to bf16 tolerance, exact-path-rounding-limited)."""

    def _pair(self, dtype):
        a = FeatureProjector(n_chan_in=64, D=16, dtype=dtype, ln_fold=False)
        b = FeatureProjector(n_chan_in=64, D=16, dtype=dtype, ln_fold=True)
        x = jax.random.normal(jax.random.PRNGKey(1), (32, 64)) * 3.0 + 5.0
        va = a.init(jax.random.PRNGKey(0), x, train=False)
        vb = b.init(jax.random.PRNGKey(0), x, train=False)
        return a, b, va, vb, x

    def test_param_tree_and_init_values_identical(self):
        _, _, va, vb, _ = self._pair(jnp.float32)
        fa = jax.tree_util.tree_leaves_with_path(va["params"])
        fb = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(vb["params"])}
        # fold path has no (param-free) LN module; fc/bn params must match
        for k, v in fa:
            ks = jax.tree_util.keystr(k)
            assert ks in fb, ks
            np.testing.assert_array_equal(np.asarray(v), np.asarray(fb[ks]))

    def test_fold_matches_exact_fp32(self):
        a, b, va, vb, x = self._pair(jnp.float32)
        ya = a.apply(va, x, train=False)
        yb = b.apply(vb, x, train=False)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=2e-4, atol=2e-5)

    def test_fold_matches_exact_bf16(self):
        a, b, va, vb, x = self._pair(jnp.bfloat16)
        ya = a.apply(va, x.astype(jnp.bfloat16), train=False)
        yb = b.apply(vb, x.astype(jnp.bfloat16), train=False)
        # the exact path rounds normalized rows to bf16 pre-GEMM; the fold
        # accumulates in fp32 — differences are bf16-rounding-scale
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=0.05, atol=0.05)

    def test_fold_checkpoint_interchangeable(self):
        # params trained/saved on one path load on the other
        a, b, va, vb, x = self._pair(jnp.float32)
        ya = a.apply(vb, x, train=False)   # exact path, fold-init params
        yb = b.apply(va, x, train=False)   # fold path, exact-init params
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=2e-4, atol=2e-5)
