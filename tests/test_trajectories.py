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


def test_blender_view_eulers():
    """The Blender OBJ renderer's view law (pure-python part) matches the
    reference render_shapenet.py:492-501: eval is the SRN Archimedes spiral
    (pitch linear 0..80deg, yaw three full turns); train stays inside the
    hemisphere bins."""
    import numpy as np

    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "render_shapenet_objs",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "render_shapenet_objs.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(0)
    n = 50
    p_eval, y_eval = mod.view_eulers("test", n, rng)
    assert p_eval[0] == 0.0
    assert np.isclose(p_eval[-1], (n - 1) / n * np.deg2rad(80.0))
    assert np.allclose(np.diff(p_eval), np.deg2rad(80.0) / n)
    assert np.allclose(y_eval, 6 * np.pi * np.arange(n) / n)

    p_tr, y_tr = mod.view_eulers("train", n, rng)
    assert ((p_tr >= 0) & (p_tr <= np.deg2rad(80.0))).all()
    base = 6 * np.pi * np.arange(n) / n
    assert ((y_tr >= base) & (y_tr <= base + np.pi / n)).all()

    tr, va, te = mod.split_scenes([f"m{i}" for i in range(20)], 0.1, 0.1,
                                  np.random.default_rng(1))
    assert len(va) == 2 and len(te) == 2 and len(tr) == 16
    assert not (set(tr) & set(va)) and not (set(tr) & set(te))
