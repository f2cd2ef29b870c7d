"""Two-process END-TO-END multi-host training through the real CLI
(VERDICT r2 items 1+2).

Unlike tests/test_distributed.py (init + loader + one psum), this runs
`ips_tpu.main.run` — full train + eval epochs — in two real processes
against a localhost coordinator, with 2 virtual CPU devices per process
and a 4-way data-parallel mesh spanning both. Asserts both processes end
with IDENTICAL replicated params, identical (global) per-epoch losses,
and a decreasing loss curve.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

# Tier: multi-minute end-to-end/compile-heavy suite -- excluded from
# the fast signal tier (pytest -m 'not slow'); run in the full pass.
pytestmark = pytest.mark.slow


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mnist_dir(tmp_path_factory):
    from ips_tpu.data.mnist import generate_megapixel_mnist
    d = tmp_path_factory.mktemp("mh_mnist")
    generate_megapixel_mnist(str(d), n_train=16, n_test=8, width=200,
                             height=200, noise=True, n_noise=5, seed=0,
                             digit_source="synthetic")
    return str(d)


def _launch(mnist_dir, steps_per_dispatch):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(port), mnist_dir,
         str(steps_per_dispatch)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MH_OK ")]
        assert lines, out[-4000:]
        results.append(json.loads(lines[0][len("MH_OK "):]))
    return results


@pytest.mark.parametrize("steps_per_dispatch", [1, 2])
def test_two_process_training_end_to_end(mnist_dir, steps_per_dispatch):
    r0, r1 = _launch(mnist_dir, steps_per_dispatch)

    # Both processes computed the same global updates: identical final
    # params and identical global per-epoch losses.
    assert r0["fingerprint"] == r1["fingerprint"], (r0, r1)
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=0, atol=0)
    assert r0["test_metrics"] == r1["test_metrics"]

    losses = r0["losses"]
    assert len(losses) == 2 and np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"train loss did not decrease: {losses}"


def _launch_env(mnist_dir, steps_per_dispatch, extra_env):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO
    env.update(extra_env)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(port), mnist_dir,
         str(steps_per_dispatch)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MH_OK ")]
        assert lines, out[-4000:]
        results.append(json.loads(lines[0][len("MH_OK "):]))
    return results


def test_two_process_checkpoint_resume(mnist_dir, tmp_path):
    """Preemption recovery on a pod: 2 processes train 1 epoch and
    checkpoint (orbax multiprocess save of the replicated global state),
    then FRESH processes resume and train epoch 2 only. Both runs agree
    across processes; the resumed run logs exactly one new epoch."""
    ckpt = str(tmp_path / "mh_ck")
    first = _launch_env(mnist_dir, 1,
                        {"MH_CKPT_DIR": ckpt, "MH_NEPOCH": "1"})
    assert first[0]["fingerprint"] == first[1]["fingerprint"]
    assert len(first[0]["losses"]) == 1

    second = _launch_env(mnist_dir, 1,
                         {"MH_CKPT_DIR": ckpt, "MH_NEPOCH": "2",
                          "MH_RESUME": "1"})
    assert second[0]["fingerprint"] == second[1]["fingerprint"]
    # resumed run trained only the remaining epoch
    assert len(second[0]["losses"]) == 1
    # and actually continued from the checkpoint, not from scratch
    assert second[0]["fingerprint"] != first[0]["fingerprint"]


def test_two_process_sparse_grouped_training(mnist_dir):
    """The flagship's real training shape — sparse_input + K-step grouped
    dispatch — across 2 processes: densify+select+train runs on global
    sharded (idx, val) pairs, every process ends with identical replicated
    params and a decreasing global loss."""
    r0, r1 = _launch_env(mnist_dir, 2, {"MH_SPARSE": "1"})
    assert r0["fingerprint"] == r1["fingerprint"], (r0, r1)
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=0, atol=0)
    losses = r0["losses"]
    assert len(losses) == 2 and np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"train loss did not decrease: {losses}"


def test_two_process_sparse_single_step_training(mnist_dir):
    """Sparse fused path at steps_per_dispatch=1 across 2 processes (the
    ungrouped per-batch sparse dispatch): global metrics line up with the
    replicated preds, identical params + decreasing loss."""
    r0, r1 = _launch_env(mnist_dir, 1, {"MH_SPARSE": "1"})
    assert r0["fingerprint"] == r1["fingerprint"], (r0, r1)
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=0, atol=0)
    losses = r0["losses"]
    assert len(losses) == 2 and np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"train loss did not decrease: {losses}"


@pytest.mark.parametrize("steps_per_dispatch", [1, 2])
def test_two_process_assembled_training(mnist_dir, steps_per_dispatch):
    """B_seq < B across 2 processes — the reference's default camelyon
    schedule shape (reference config/camelyon_config.yml:4-5). The loader
    runs at optimizer-batch granularity (B rows; each process loads its
    r/P loader-slots), the global (r, B_seq, N, ...) payload shards
    slot-major over `data`, and K optimizer steps group per dispatch.
    Both processes must agree exactly and the loss must decrease."""
    r0, r1 = _launch_env(mnist_dir, steps_per_dispatch, {"MH_BSEQ": "2"})
    assert r0["fingerprint"] == r1["fingerprint"], (r0, r1)
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=0, atol=0)
    assert r0["test_metrics"] == r1["test_metrics"]
    losses = r0["losses"]
    assert len(losses) == 2 and np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"train loss did not decrease: {losses}"


def test_two_process_assembled_equals_single_process(mnist_dir):
    """Multi-host assembled training must reproduce the single-process
    legacy select-assemble-train schedule: same selection rngs (slot g =
    loader batch g), same lr sequence, same update order."""
    r0, _ = _launch_env(mnist_dir, 1, {"MH_BSEQ": "2"})

    from ips_tpu.config import config_from_dict
    from ips_tpu.main import run
    from tests.multihost_worker import TASKS
    conf = config_from_dict(dict(
        n_epoch=2, B=8, B_seq=2, n_epoch_warmup=1, lr=1e-3, wd=0.1,
        n_class=10, data_dir=mnist_dir, n_worker=0, eager=True,
        is_image=True, enc_type="resnet18", n_chan_in=1, n_res_blocks=2,
        shuffle=True, shuffle_style="batch", n_token=4,
        N=16, M=4, I=4, patch_size=[50, 50], patch_stride=[50, 50],
        use_pos=True, H=4, D=128, D_k=16, D_v=16, D_inner=128,
        donate_buffers=False, tasks=TASKS))
    trainer, log_train, log_test = run(conf, "mnist")

    single_losses = [
        float(np.mean([log_train.losses_epoch[t.name][e]
                       for t in log_train.tasks])) for e in range(2)]
    # epoch 1 proves identical batch composition + rng/lr sequences
    # (measured agreement ~5e-6 relative); later epochs accumulate
    # AdamW-amplified fp32 reassociation differences between device
    # counts (same effect the B_seq==B equality test documents), so the
    # full sequence gets a looser bound.
    np.testing.assert_allclose(single_losses[0], r0["losses"][0],
                               rtol=1e-4)
    np.testing.assert_allclose(single_losses, r0["losses"], rtol=1e-3)


def test_two_process_equals_single_process(mnist_dir):
    """2-process multi-host training must produce the SAME numbers as the
    identical single-process run (same global batches, same rngs): the
    distributed layer is an execution detail, not a semantics change."""
    r0, _ = _launch(mnist_dir, 1)

    # same config, single process, same seeds/data — run inline
    from ips_tpu.config import config_from_dict
    from ips_tpu.main import run
    from tests.multihost_worker import TASKS
    conf = config_from_dict(dict(
        n_epoch=2, B=8, B_seq=8, n_epoch_warmup=1, lr=1e-3, wd=0.1,
        n_class=10, data_dir=mnist_dir, n_worker=0, eager=True,
        is_image=True, enc_type="resnet18", n_chan_in=1, n_res_blocks=2,
        shuffle=True, shuffle_style="batch", n_token=4,
        N=16, M=4, I=4, patch_size=[50, 50], patch_stride=[50, 50],
        use_pos=True, H=4, D=128, D_k=16, D_v=16, D_inner=128,
        donate_buffers=False, tasks=TASKS))
    trainer, log_train, log_test = run(conf, "mnist")

    import jax
    import jax.numpy as jnp
    single_losses = [
        float(np.mean([log_train.losses_epoch[t.name][e]
                       for t in log_train.tasks])) for e in range(2)]
    # per-epoch losses agree to float tolerance (different device counts
    # reassociate reductions; the sequence itself is the same)
    np.testing.assert_allclose(single_losses, r0["losses"], rtol=1e-4)
    single_fp = float(sum(jnp.sum(l.astype(jnp.float32)) for l in
                          jax.tree_util.tree_leaves(trainer.state.params)))
    # AdamW's adaptive rescaling compounds fp32 reassociation differences
    # between device counts (measured ~5e-4 relative after 4 steps); the
    # strict semantic check is the per-epoch loss equality above
    assert abs(single_fp - r0["fingerprint"]) / abs(single_fp) < 2e-3, \
        (single_fp, r0["fingerprint"])
    assert log_test.latest().keys() == r0["test_metrics"].keys()
