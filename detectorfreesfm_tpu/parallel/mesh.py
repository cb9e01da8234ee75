"""Device mesh setup + sharding helpers.

The reference parallelizes with Ray workers holding fractional GPUs
(SURVEY.md §2.4: scene/pair/track fan-out at 1 / 0.5 / 0.25 GPU granularity).
The TPU-native equivalent is one SPMD program: work items (image pairs, track
bags, BA residual blocks) are padded to a device multiple and sharded over the
leading axis of a `jax.sharding.Mesh`; XLA inserts the collectives.

Axes convention:
  * "data"  — batch / work-item axis (pairs, bags, scenes). Always present.
  * "model" — optional tensor axis for sharding attention heads / channels of
    the matcher transformer on big meshes.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_axis: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the first `n_devices` devices.

    model_axis=1 yields pure data parallelism (the default for pair matching:
    every pair forward is independent, so DP saturates the chips without any
    cross-chip traffic — the tensor axis only pays off once a single pair's
    activations exceed one chip's HBM).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % model_axis == 0, (n_devices, model_axis)
    return Mesh(
        devices.reshape(n_devices // model_axis, model_axis), ("data", "model")
    )


@functools.lru_cache(maxsize=None)
def get_mesh() -> Mesh:
    """Process-wide default mesh over all visible devices (data-parallel)."""
    return make_mesh()


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def shard_leading_axis(tree, mesh: Mesh, axis_name: str = "data"):
    """Device_put a pytree with the leading axis sharded over `axis_name`.

    Leaves must have a leading dim divisible by the axis size (use
    pad_to_multiple + padding rows beforehand).
    """
    def put(x):
        spec = P(axis_name, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (e.g. model params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
