"""Video trajectory generators: spherical orbit and periodic pose spline."""
import numpy as np

from pixelnerf_tpu.apps.gen_video import spherical_trajectory, spline_trajectory
from pixelnerf_tpu.data import SyntheticSphereDataset


def test_spherical_orbit():
    poses = spherical_trajectory(12, elevation=-10.0, radius=2.0)
    assert poses.shape == (12, 4, 4)
    rad = np.linalg.norm(poses[:, :3, 3], axis=-1)
    np.testing.assert_allclose(rad, 2.0, atol=1e-5)
    R = poses[:, :3, :3]
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", R, R), np.tile(np.eye(3), (12, 1, 1)), atol=1e-5
    )


def test_spline_through_poses():
    """Periodic cubic spline through dataset poses: valid rotations, stays
    near the camera sphere, passes close to the keyframes."""
    ds = SyntheticSphereDataset(num_objects=1, num_views=6)
    poses = ds[0]["poses"]
    out = spline_trajectory(poses, 24)
    assert out.shape == (24, 4, 4)
    R = out[:, :3, :3]
    orth = np.abs(np.einsum("nij,nkj->nik", R, R) - np.eye(3)).max()
    assert orth < 1e-5
    rad = np.linalg.norm(out[:, :3, 3], axis=-1)
    base = np.linalg.norm(poses[0, :3, 3])
    assert rad.min() > 0.8 * base and rad.max() < 1.2 * base
    # t_eval includes the keyframe parameters -> exact keyframe translations
    # every 24/6 frames when counts align; check frame 0 hits pose 0
    np.testing.assert_allclose(out[0, :3, 3], poses[0, :3, 3], atol=1e-5)
