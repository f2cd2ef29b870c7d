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
