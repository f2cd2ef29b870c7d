"""Pretrained-weight conversion: torch state-dict -> npz -> flax encoder."""

import numpy as np
import pytest

from ips_tpu.models.encoders import ConvPatchEncoder
from ips_tpu.models.pretrained import (load_encoder_npz, save_npz,
                                       torch_resnet_to_flat)


def _fake_resnet18_state(rng):
    """Random torchvision-named resnet18 state dict (numpy tensors)."""
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = rng.normal(0, 0.1, (cout, cin, k, k)).astype(
            np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.normal(1, 0.1, c).astype(np.float32)
        sd[name + ".bias"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[name + ".running_mean"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[name + ".running_var"] = np.abs(
            rng.normal(1, 0.1, c)).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    for stage in range(4):
        w = widths[stage]
        w_in = 64 if stage == 0 else widths[stage - 1]
        for b in range(2):
            p = f"layer{stage + 1}.{b}"
            conv(p + ".conv1", w, w_in if b == 0 else w, 3)
            bn(p + ".bn1", w)
            conv(p + ".conv2", w, w, 3)
            bn(p + ".bn2", w)
            if b == 0 and stage > 0:
                conv(p + ".downsample.0", w, w_in, 1)
                bn(p + ".downsample.1", w)
    return sd


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
