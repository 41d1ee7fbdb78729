"""Geometry core vs independently-computed golden values (torch/numpy)."""
import numpy as np
import pytest

from pixelnerf_tpu.utils import geometry


def test_unproj_map_directions():
    H, W, f = 5, 7, 10.0
    m = np.asarray(geometry.unproj_map(W, H, f))
    assert m.shape == (H, W, 3)
    # unit norm everywhere
    np.testing.assert_allclose(np.linalg.norm(m, axis=-1), 1.0, atol=1e-6)
    # center pixel looks straight down -Z
    cx, cy = W * 0.5, H * 0.5
    x, y = 3, 2  # pixel at (3, 2): offset (3-3.5, 2-2.5)
    d = np.array([(x - cx) / f, -(y - cy) / f, -1.0])
    d /= np.linalg.norm(d)
    np.testing.assert_allclose(m[y, x], d, atol=1e-6)


def test_unproj_map_matches_torch_reference_formula():
    import torch

    H, W = 8, 6
    f, c = 11.0, torch.tensor([2.0, 3.0])
    Y, X = torch.meshgrid(
        torch.arange(H, dtype=torch.float32) - 3.0,
        torch.arange(W, dtype=torch.float32) - 2.0,
        indexing="ij",
    )
    X = X / f
    Y = Y / f
    unproj = torch.stack((X, -Y, -torch.ones_like(X)), dim=-1)
    unproj = unproj / unproj.norm(dim=-1, keepdim=True)
    ours = np.asarray(geometry.unproj_map(W, H, f, c=np.array([2.0, 3.0])))
    np.testing.assert_allclose(ours, unproj.numpy(), atol=1e-6)


def test_gen_rays_shapes_and_origin():
    pose = geometry.look_at(np.array([0.0, 0.0, 2.0]), np.zeros(3))
    rays = np.asarray(geometry.gen_rays(pose[None], 4, 4, 10.0, 0.5, 2.5))
    assert rays.shape == (1, 4, 4, 8)
    np.testing.assert_allclose(
        rays[0, :, :, :3], np.broadcast_to(pose[:3, 3], (4, 4, 3)), atol=1e-6
    )
    np.testing.assert_allclose(rays[..., 6], 0.5)
    np.testing.assert_allclose(rays[..., 7], 2.5)
    # camera at +z looking at origin: central rays point toward -z
    assert rays[0, 2, 2, 5] < -0.9


def test_invert_pose_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(5, 4))
    R = np.asarray(geometry.quat_to_rot(q))
    t = rng.normal(size=(5, 3))
    poses = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    poses[:, :3, :3] = R
    poses[:, :3, 3] = t
    w2c = np.asarray(geometry.invert_pose(poses))
    # w2c applied to camera center should give 0
    ctr = np.einsum("bij,bj->bi", w2c[:, :, :3], t) + w2c[:, :, 3]
    np.testing.assert_allclose(ctr, 0.0, atol=1e-5)
    # points transform consistently: x_cam = R^T (x - t)
    x = rng.normal(size=(5, 3))
    expect = np.einsum("bji,bj->bi", R, x - t)
    got = np.einsum("bij,bj->bi", w2c[:, :, :3], x) + w2c[:, :, 3]
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_quat_rot_roundtrip():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(8, 4))
    q[:, 0] = np.abs(q[:, 0]) + 1.5  # keep w-positive hemisphere
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = geometry.quat_to_rot(q)
    q2 = np.asarray(geometry.rot_to_quat(R))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_pose_spherical_matches_torch_reference():
    import torch

    theta, phi, radius = 30.0, -45.0, 2.0

    def t_trans(t):
        return torch.tensor(
            [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, t], [0, 0, 0, 1]],
            dtype=torch.float32,
        )

    def t_rotphi(p):
        return torch.tensor(
            [[1, 0, 0, 0],
             [0, np.cos(p), -np.sin(p), 0],
             [0, np.sin(p), np.cos(p), 0],
             [0, 0, 0, 1]], dtype=torch.float32)

    def t_rottheta(th):
        return torch.tensor(
            [[np.cos(th), 0, -np.sin(th), 0],
             [0, 1, 0, 0],
             [np.sin(th), 0, np.cos(th), 0],
             [0, 0, 0, 1]], dtype=torch.float32)

    c2w = t_trans(radius)
    c2w = t_rotphi(phi / 180.0 * np.pi) @ c2w
    c2w = t_rottheta(theta / 180.0 * np.pi) @ c2w
    c2w = (
        torch.tensor(
            [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
            dtype=torch.float32,
        ) @ c2w
    )
    np.testing.assert_allclose(
        geometry.pose_spherical(theta, phi, radius), c2w.numpy(), atol=1e-6
    )


def test_combine_interleaved():
    import jax.numpy as jnp

    t = jnp.arange(24.0).reshape(12, 2)  # (SB=2 * NS=3 * B=2, 2)
    avg = np.asarray(geometry.combine_interleaved(t, (3, 2), "average"))
    assert avg.shape == (2, 2, 2)
    manual = np.asarray(t).reshape(2, 3, 2, 2).mean(axis=1)
    np.testing.assert_allclose(avg, manual)
    mx = np.asarray(geometry.combine_interleaved(t, (3, 2), "max"))
    np.testing.assert_allclose(mx, np.asarray(t).reshape(2, 3, 2, 2).max(axis=1))
    # identity case
    same = geometry.combine_interleaved(t, (1,))
    np.testing.assert_allclose(np.asarray(same), np.asarray(t))


def test_repeat_interleave_matches_torch():
    import torch

    x = np.arange(12.0).reshape(3, 4)
    ours = np.asarray(geometry.repeat_interleave(x, 2))
    theirs = torch.repeat_interleave(torch.tensor(x), 2, dim=0).numpy()
    np.testing.assert_allclose(ours, theirs)


def test_batched_index_select_nd():
    import torch

    rng = np.random.default_rng(2)
    t = rng.normal(size=(4, 10, 3, 2)).astype(np.float32)
    inds = rng.integers(0, 10, size=(4, 5))
    ours = np.asarray(geometry.batched_index_select_nd(t, inds))
    tt = torch.tensor(t)
    ti = torch.tensor(inds)
    theirs = tt.gather(
        1, ti[(...,) + (None,) * 2].expand(-1, -1, 3, 2)
    ).numpy()
    np.testing.assert_allclose(ours, theirs)


def test_look_at_orthonormal():
    m = geometry.look_at([1.0, 2.0, 3.0], [0.0, 0.0, 0.0])
    R = m[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
    # back axis points from target to origin
    back = np.array([1.0, 2.0, 3.0]) / np.linalg.norm([1.0, 2.0, 3.0])
    np.testing.assert_allclose(R[:, 2], back, atol=1e-6)
