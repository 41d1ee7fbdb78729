"""Device-mesh layer: named shardings over ICI.

This is the first-class replacement for the reference's multi-GPU story —
``torch.nn.DataParallel(wrapped, gpus, dim=1)`` scattering the ray dimension
every forward (reference src/render/nerf.py:354-371). Here the mesh is
persistent, shardings are compiled into the program, and XLA inserts the
collectives:

- axis ``"data"``: object (super-batch) dimension — the training DP axis;
  gradient all-reduce rides ICI via jit's automatic psum.
- axis ``"ray"``: per-object ray dimension — the DataParallel-dim1 analog;
  rendering along it is communication-free.

Params and small intrinsics replicate; feature latents shard over "data"
only (each ray shard needs its object's full feature map).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
RAY_AXIS = "ray"


def make_mesh(
    data: Optional[int] = None,
    ray: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, ray) mesh over the given devices.

    Defaults: all devices on the ray axis (pure ray sharding, the eval
    layout). ``make_mesh(data=N)`` puts N-way object parallelism first and
    the rest on rays.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and ray is None:
        data, ray = 1, n
    elif data is None:
        data = n // ray
    elif ray is None:
        ray = n // data
    assert data * ray == n, f"mesh {data}x{ray} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, ray)
    return Mesh(dev_array, (DATA_AXIS, RAY_AXIS))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """(SB, B, ...) rays: B sharded over every mesh axis (eval layout)."""
    return NamedSharding(mesh, P(None, (DATA_AXIS, RAY_AXIS)))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(SB, B, ...) training batch: SB over data, B over ray."""
    return NamedSharding(mesh, P(DATA_AXIS, RAY_AXIS))


def object_sharding(mesh: Mesh) -> NamedSharding:
    """(SB, ...) per-object arrays (images, poses): SB over data."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# the train batch schema — the SINGLE source of truth shared by
# shard_batch and make_train_step's in_shardings. RAY_AXIS_KEYS are the
# entries whose SECOND axis is the ray axis (sharded over 'ray');
# everything else is per-object only. Keyed explicitly: a pure
# shape-divisibility heuristic mis-shards e.g. c (SB, 2) on a ray=2 mesh or
# images (SB, NS, ...) when NS divides the ray axis, conflicting with the
# train step's declared in_shardings.
BATCH_KEYS = ("images", "poses", "focal", "c", "rays", "rgb_gt")
RAY_AXIS_KEYS = ("rays", "rgb_gt")


def shard_batch(mesh: Mesh, tree):
    """Place a host batch onto the mesh: leading axis = objects over 'data';
    for the ray-major entries (``RAY_AXIS_KEYS``) the second axis goes over
    'ray'."""
    def place(x, ray_axis: bool):
        x = np.asarray(x)
        if (
            ray_axis
            and x.ndim >= 2
            and x.shape[0] % mesh.shape[DATA_AXIS] == 0
            and x.shape[1] % mesh.shape[RAY_AXIS] == 0
        ):
            spec = P(DATA_AXIS, RAY_AXIS)
        elif x.ndim >= 1 and x.shape[0] % mesh.shape[DATA_AXIS] == 0:
            spec = P(DATA_AXIS)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    if isinstance(tree, dict):
        return {
            k: jax.tree_util.tree_map(
                lambda x, k=k: place(x, k in RAY_AXIS_KEYS), v
            )
            for k, v in tree.items()
        }
    return jax.tree_util.tree_map(lambda x: place(x, True), tree)
