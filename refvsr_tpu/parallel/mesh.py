"""Device mesh + sharding helpers (TPU-native data parallelism).

The reference's distributed story is DDP-over-NCCL data parallelism
(/root/reference/run.py:209-216, trainers/trainer.py:63-67). The TPU-native
equivalent: a 1-D `data` mesh; the batch axis is sharded, parameters are
replicated; XLA inserts the gradient all-reduce (psum) over ICI automatically
from the sharding annotations — no explicit collectives in user code
(SURVEY.md §2.2). A `spatial` axis is reserved for sharding 8K frames across
chips (halo exchange handled by XLA for convs)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_spatial: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    dev_array = np.asarray(devices[: n_data * n_spatial]).reshape(
        n_data, n_spatial)
    return Mesh(dev_array, axis_names=("data", "spatial"))


def shard_batch(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_parallel_shardings(mesh: Mesh, batch_example, state_example):
    """Convenience: (batch shardings by-leaf-rank, replicated state sharding)."""
    batch_sh = jax.tree_util.tree_map(
        lambda x: shard_batch(mesh, np.ndim(x)), batch_example)
    state_sh = jax.tree_util.tree_map(lambda _: replicate(mesh), state_example)
    return batch_sh, state_sh
