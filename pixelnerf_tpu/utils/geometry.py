"""Camera / ray geometry, pose math and multiview reductions.

Functional-jnp counterpart of the reference's tensor utilities
(/root/reference/src/util/util.py). Conventions (which checkpoint and metric
parity depend on):

- camera looks down **-Z**, y-up: the unprojection map builds unit directions
  ``(X, -Y, -Z)`` (reference util.py:141)
- a ray is the 8-vector ``[origin(3), dir(3), near(1), far(1)]``
  (reference util.py:274-276)
- poses handed around are camera-to-world; ``invert_pose`` produces the
  world-to-camera 3x4 used by the conditional field (reference models.py:112-114)

All functions are pure and jit/vmap/shard_map friendly; image sizes are static
Python ints so XLA sees fixed shapes.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def homogeneous(points: jax.Array) -> jax.Array:
    """Append homogeneous 1 to the last axis: (..., 3) -> (..., 4)."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def _as_fxfy(f) -> jax.Array:
    """Normalize focal to a (2,) [fx, fy] array (scalar / (2,) accepted)."""
    f = jnp.asarray(f, dtype=jnp.float32)
    f = jnp.squeeze(f)
    if f.ndim == 0:
        f = jnp.stack([f, f])
    return f


def unproj_map(width: int, height: int, f, c=None) -> jax.Array:
    """Per-pixel unit camera-ray directions, (H, W, 3).

    Matches reference util.py:113-143: pixel (x, y) maps to the unit vector of
    ``((x - cx)/fx, -(y - cy)/fy, -1)``; -Y because image y grows downward,
    -Z because the camera looks down -Z.
    """
    if c is None:
        c = jnp.array([width * 0.5, height * 0.5], dtype=jnp.float32)
    else:
        c = jnp.squeeze(jnp.asarray(c, dtype=jnp.float32))
    f = _as_fxfy(f)
    ys = jnp.arange(height, dtype=jnp.float32)[:, None] - c[1]   # (H, 1)
    xs = jnp.arange(width, dtype=jnp.float32)[None, :] - c[0]    # (1, W)
    X = jnp.broadcast_to(xs / f[0], (height, width))
    Y = jnp.broadcast_to(ys / f[1], (height, width))
    Z = jnp.ones((height, width), dtype=jnp.float32)
    dirs = jnp.stack([X, -Y, -Z], axis=-1)
    return dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)


def ndc_rays(width: int, height: int, focal, near, origins, directions):
    """Shift rays to the NDC space used by forward-facing NeRF scenes."""
    f = _as_fxfy(focal)
    t = -(near + origins[..., 2]) / directions[..., 2]
    origins = origins + t[..., None] * directions
    o0 = -f[0] * 2.0 / width * origins[..., 0] / origins[..., 2]
    o1 = -f[1] * 2.0 / height * origins[..., 1] / origins[..., 2]
    o2 = 1.0 + 2.0 * near / origins[..., 2]
    d0 = (-f[0] * 2.0 / width) * (
        directions[..., 0] / directions[..., 2] - origins[..., 0] / origins[..., 2]
    )
    d1 = (-f[1] * 2.0 / height) * (
        directions[..., 1] / directions[..., 2] - origins[..., 1] / origins[..., 2]
    )
    d2 = -2.0 * near / origins[..., 2]
    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def gen_rays(
    poses: jax.Array,
    width: int,
    height: int,
    focal,
    z_near,
    z_far,
    c=None,
    ndc: bool = False,
) -> jax.Array:
    """Generate camera rays for each pose: (B, H, W, 8).

    Reference util.py:238-276. ``poses`` are camera-to-world (B, 4, 4).
    """
    poses = jnp.asarray(poses, dtype=jnp.float32)
    unproj = unproj_map(width, height, f=focal, c=c)          # (H, W, 3)
    raydir = jnp.einsum("bij,hwj->bhwi", poses[:, :3, :3], unproj)
    centers = jnp.broadcast_to(
        poses[:, None, None, :3, 3], (poses.shape[0], height, width, 3)
    )
    if ndc:
        z_near, z_far = 0.0, 1.0
        centers, raydir = ndc_rays(width, height, focal, 1.0, centers, raydir)
    nears = jnp.full((poses.shape[0], height, width, 1), z_near, dtype=jnp.float32)
    fars = jnp.full((poses.shape[0], height, width, 1), z_far, dtype=jnp.float32)
    return jnp.concatenate([centers, raydir, nears, fars], axis=-1)


def invert_pose(poses: jax.Array) -> jax.Array:
    """Camera-to-world (..., 4, 4) -> world-to-camera (..., 3, 4).

    rot = R^T, trans = -R^T t (reference models.py:112-114).
    """
    rot = jnp.swapaxes(poses[..., :3, :3], -1, -2)
    trans = -jnp.einsum("...ij,...j->...i", rot, poses[..., :3, 3])
    return jnp.concatenate([rot, trans[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Pose constructors (host-side helpers; numpy in float32)
# ---------------------------------------------------------------------------

def trans_t(t: float) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[2, 3] = t
    return m


def rot_phi(phi: float) -> np.ndarray:
    c, s = math.cos(phi), math.sin(phi)
    return np.array(
        [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], dtype=np.float32
    )


def rot_theta(th: float) -> np.ndarray:
    c, s = math.cos(th), math.sin(th)
    return np.array(
        [[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]], dtype=np.float32
    )


def pose_spherical(theta: float, phi: float, radius: float) -> np.ndarray:
    """NeRF-style spherical camera pose (reference util.py:309-323)."""
    c2w = trans_t(radius)
    c2w = rot_phi(phi / 180.0 * math.pi) @ c2w
    c2w = rot_theta(theta / 180.0 * math.pi) @ c2w
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float32
    )
    return flip @ c2w


def look_at(origin, target, world_up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Camera-to-world matrix for a camera at `origin` looking at `target`."""
    origin = np.asarray(origin, dtype=np.float32)
    target = np.asarray(target, dtype=np.float32)
    world_up = np.asarray(world_up, dtype=np.float32)
    back = origin - target
    back = back / np.linalg.norm(back)
    right = np.cross(world_up, back)
    right = right / np.linalg.norm(right)
    up = np.cross(back, right)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, up, back, origin
    return m


def coord_from_blender(dtype=np.float32) -> np.ndarray:
    """Blender (x right, y in, z up) -> standard (x right, y up, z out)."""
    return np.array(
        [[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0], [0, 0, 0, 1]], dtype=dtype
    )


def coord_to_blender(dtype=np.float32) -> np.ndarray:
    return np.array(
        [[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=dtype
    )


# ---------------------------------------------------------------------------
# Quaternions (jnp; batched (B, 4) <-> (B, 3, 3))
# ---------------------------------------------------------------------------

def quat_to_rot(q: jax.Array) -> jax.Array:
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    qr, qi, qj, qk = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (qj**2 + qk**2), 2 * (qj * qi - qk * qr), 2 * (qi * qk + qr * qj),
            2 * (qj * qi + qk * qr), 1 - 2 * (qi**2 + qk**2), 2 * (qj * qk - qi * qr),
            2 * (qk * qi - qj * qr), 2 * (qj * qk + qi * qr), 1 - 2 * (qi**2 + qj**2),
        ],
        axis=-1,
    )
    return r.reshape(*q.shape[:-1], 3, 3)


def rot_to_quat(R: jax.Array) -> jax.Array:
    w = jnp.sqrt(1.0 + R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]) / 2.0
    x = (R[..., 2, 1] - R[..., 1, 2]) / (4 * w)
    y = (R[..., 0, 2] - R[..., 2, 0]) / (4 * w)
    z = (R[..., 1, 0] - R[..., 0, 1]) / (4 * w)
    return jnp.stack([w, x, y, z], axis=-1)


# ---------------------------------------------------------------------------
# Multiview reductions / batched gathers
# ---------------------------------------------------------------------------

def repeat_interleave(x: jax.Array, repeats: int) -> jax.Array:
    """Repeat along axis 0, interleaved (reference util.py:58-65)."""
    if repeats == 1:
        return x
    return jnp.repeat(x, repeats, axis=0)


def combine_interleaved(
    t: jax.Array, inner_dims: Sequence[int] = (1,), agg_type: str = "average"
) -> jax.Array:
    """Reduce over the interleaved views axis (reference util.py:461-471).

    t of shape (prod(inner_dims)*N, ...) is viewed as (N, *inner_dims, ...)
    and reduced over axis 1 (the view count).
    """
    if len(inner_dims) == 1 and inner_dims[0] == 1:
        return t
    t = t.reshape(-1, *inner_dims, *t.shape[1:])
    if agg_type == "average":
        return jnp.mean(t, axis=1)
    if agg_type == "max":
        return jnp.max(t, axis=1)
    raise NotImplementedError(f"Unsupported combine type {agg_type}")


def batched_index_select_nd(t: jax.Array, inds: jax.Array) -> jax.Array:
    """Gather along dim 1 of a batched tensor: t (B, N, ...), inds (B, K)."""
    return jnp.take_along_axis(
        t, inds.reshape(inds.shape + (1,) * (t.ndim - 2)), axis=1
    )
