"""Test configuration: force an 8-device virtual CPU mesh.

The standard JAX trick for testing pjit/shard_map logic without TPU pods
(SURVEY.md §4). Must run before any test touches jax devices; the build
image's sitecustomize registers a TPU backend in every process, so we
switch the platform explicitly (env vars alone are overridden there).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from ips_tpu.config import Config, config_from_dict  # noqa: E402


@pytest.fixture(scope="session")
def tiny_conf() -> Config:
    """Small image-mode config that compiles fast on CPU."""
    return config_from_dict(dict(
        n_epoch=2, B=4, B_seq=4, n_epoch_warmup=1, lr=1e-3, wd=0.1,
        n_class=10, is_image=True, enc_type="resnet18", n_chan_in=1,
        n_res_blocks=2, shuffle=True, shuffle_style="batch", n_token=2,
        N=12, M=4, I=4, patch_size=[16, 16], patch_stride=[16, 16],
        use_pos=True, H=4, D=128, D_k=16, D_v=16, D_inner=256,
        compute_dtype="float32", donate_buffers=False,
        tasks={
            "task0": {"id": 0, "name": "majority", "act_fn": "softmax",
                      "metric": "accuracy"},
            "task1": {"id": 1, "name": "multi", "act_fn": "sigmoid",
                      "metric": "multilabel_accuracy"},
        }))


@pytest.fixture(scope="session")
def feat_conf() -> Config:
    """Small feature-mode (projector) config, camelyon-style."""
    return config_from_dict(dict(
        n_epoch=2, B=4, B_seq=1, n_epoch_warmup=1, lr=1e-3, wd=0.1,
        n_class=1, is_image=False, n_chan_in=32, shuffle=True,
        shuffle_style="batch", n_token=1, N=0, M=8, I=8, use_pos=False,
        H=2, D=16, D_k=8, D_v=8, D_inner=32, compute_dtype="float32",
        donate_buffers=False,
        tasks={"task0": {"id": 0, "name": "metastases", "act_fn": "sigmoid",
                         "metric": "auc"}}))


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture()
def np_rng():
    return np.random.default_rng(0)
