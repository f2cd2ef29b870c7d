"""Device-mesh construction and sharding helpers.

A first-class layer the reference does not have (it is pinned to one GPU,
reference main.py:19-20; SURVEY.md §2.3). Axes:

  * ``data``  — data parallelism: the global batch is sharded, gradients
                are combined by XLA-inserted psums over ICI.
  * ``patch`` — context/sequence parallelism over the patch axis: each
                device streams its slice of the N patches through a local
                top-M selection; survivors are merged globally (see
                ips_tpu/parallel/ips_sharded.py).

Multi-host: pass the full ``jax.devices()`` list — the mesh spans hosts
and XLA routes collectives over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PATCH_AXIS = "patch"


def make_mesh(data: int = 1, patch: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * patch
    if need > len(devices):
        raise ValueError(
            f"mesh ({data}x{patch}) needs {need} devices, "
            f"have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(data, patch)
    return Mesh(grid, (DATA_AXIS, PATCH_AXIS))


def batch_spec(ndim: int, patch_dim: Optional[int] = None) -> P:
    """PartitionSpec sharding dim 0 over data (and patch_dim over patch)."""
    spec: list = [None] * ndim
    spec[0] = DATA_AXIS
    if patch_dim is not None:
        spec[patch_dim] = PATCH_AXIS
    return P(*spec)


def shard_batch(mesh: Mesh, tree: Any, patch_dim: Optional[int] = None) -> Any:
    """Device-put a batch pytree sharded over the data (and patch) axes.

    A leading dim that does not divide the data axis (e.g. a B_seq=1
    loader batch on a multi-device mesh — the reference's default
    camelyon shape) is replicated instead; any patch_dim sharding is
    kept."""
    def put(x):
        if x is None:
            return None
        spec = batch_spec(np.ndim(x), patch_dim if np.ndim(x) > 1 else None)
        if np.shape(x)[0] % mesh.shape[DATA_AXIS]:
            spec = P(None, *spec[1:])
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree (parameters, optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if x is not None else None,
        tree)
