"""Genuine torch-serialized checkpoint -> convert CLI -> train (VERDICT r2
item 9 / missing #4).

The earlier pretrained tests feed the converter numpy dicts; this one
serializes a REAL torch state dict (torch.save, torch.Tensor values, the
exact torchvision resnet18 key set), converts it with the actual CLI
entry (`python -m ips_tpu.models.pretrained`), then trains one epoch from
the converted weights through the real config path
(pretrained=true / pretrained_path). Reference analog: ImageNet weight
loading, reference architecture/ips_net.py:20-27.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ips_tpu.models.pretrained import main as convert_main  # noqa: E402
from tests.test_pretrained import _fake_resnet18_state  # noqa: E402

# Tier: multi-minute end-to-end/compile-heavy suite -- excluded from
# the fast signal tier (pytest -m 'not slow'); run in the full pass.
pytestmark = pytest.mark.slow



def _torch_state_dict(rng):
    return {k: torch.from_numpy(v)
            for k, v in _fake_resnet18_state(rng).items()}


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    d = tmp_path_factory.mktemp("torch_ckpt")
    # full torchvision schema (incl. fc head + num_batches_tracked
    # counters) so the CLI's default --schema full validation runs
    sd = _torch_state_dict(np.random.default_rng(0))
    pth = str(d / "resnet18.pth")
    torch.save(sd, pth)
    npz = str(d / "weights.npz")
    convert_main([pth, npz])
    return pth, npz


def test_cli_converts_genuine_torch_checkpoint(converted):
    pth, npz = converted
    flat = dict(np.load(npz))
    sd = torch.load(pth, map_location="cpu", weights_only=True)
    # conv kernels are OIHW -> HWIO transposed, BN stats split correctly
    np.testing.assert_array_equal(
        flat["params/layer1_block0/conv1/kernel"],
        sd["layer1.0.conv1.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        flat["batch_stats/layer2_block0/downsample_bn/var"],
        sd["layer2.0.downsample.1.running_var"].numpy())


def test_train_one_epoch_from_converted_weights(converted):
    from ips_tpu.config import config_from_dict
    from ips_tpu.train.loop import train_one_epoch
    from ips_tpu.train.metrics import MetricsLogger
    from ips_tpu.train.steps import IPSTrainer
    from tests.test_train_loop import SignalPatches
    from ips_tpu.data.loader import DataLoader

    pth, npz = converted
    conf = config_from_dict(dict(
        n_epoch=1, B=4, B_seq=4, n_epoch_warmup=1, lr=1e-4, wd=0.01,
        n_class=4, is_image=True, enc_type="resnet18", n_chan_in=1,
        n_res_blocks=2, pretrained=True, pretrained_path=npz,
        shuffle=True, shuffle_style="batch", n_token=1,
        N=12, M=4, I=4, patch_size=[16, 16], patch_stride=[16, 16],
        use_pos=False, H=4, D=128, D_k=16, D_v=16, D_inner=64,
        donate_buffers=False,
        tasks={"task0": {"id": 0, "name": "majority", "act_fn": "softmax",
                         "metric": "accuracy"}}))
    trainer = IPSTrainer(conf)

    # the encoder really initialized from the checkpoint (layer1 kernels
    # match; the 1-channel conv1 stem keeps its init — reference swaps the
    # stem after loading, ips_net.py:27-31)
    sd = torch.load(pth, map_location="cpu", weights_only=True)
    got = np.asarray(
        trainer.state.params["encoder"]["layer1_block0"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        got, sd["layer1.0.conv1.weight"].numpy().transpose(2, 3, 1, 0),
        rtol=1e-6)
    assert trainer.state.params["encoder"]["conv1"]["kernel"].shape[2] == 1

    data = SignalPatches(conf, n_samples=8)
    loader = DataLoader(data, batch_size=conf.B_seq, shuffle=True, seed=0)
    log = MetricsLogger(conf.task_list)
    train_one_epoch(trainer, loader, 0, log, conf)
    log.compute_metric()
    assert np.isfinite(log.losses_epoch["majority"][0])
    # params moved off the checkpoint values after the update
    after = np.asarray(
        trainer.state.params["encoder"]["layer1_block0"]["conv1"]["kernel"])
    assert not np.array_equal(after, got)
