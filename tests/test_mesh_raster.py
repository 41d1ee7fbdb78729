"""Software OBJ renderer: loader, rasterizer referee, end-to-end dataset.

The z-buffer rasterizer (`utils/mesh_raster.py`) backs
``scripts/render_shapenet_objs.py --backend software`` — the no-Blender path
for producing multi-object datasets from real OBJ geometry (reference
counterpart: scripts/render_shapenet.py, Blender-only). The referee here is
the analytic sphere tracer (`data/synthetic._trace_spheres`): an icosphere
mesh rasterized from a pinhole camera must reproduce the analytic sphere's
silhouette and per-pixel hit distance.
"""
import json
import os
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pixelnerf_tpu.data.synthetic import _trace_spheres
from pixelnerf_tpu.utils.geometry import look_at
from pixelnerf_tpu.utils.mesh_raster import (
    DEFAULT_COLOR,
    load_obj,
    normalize_mesh,
    rasterize,
)


def _icosphere(center, radius, subdiv=4):
    """Octahedron subdivided `subdiv` times, vertices pushed to the sphere."""
    verts = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.float64,
    )
    faces = np.array(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]],
        np.int64,
    )
    for _ in range(subdiv):
        edge_mid = {}
        new_faces = []
        verts = list(map(tuple, verts))

        def mid(i, j):
            key = (min(i, j), max(i, j))
            if key not in edge_mid:
                m = (np.asarray(verts[i]) + np.asarray(verts[j])) / 2.0
                m = m / np.linalg.norm(m)
                verts.append(tuple(m))
                edge_mid[key] = len(verts) - 1
            return edge_mid[key]

        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        faces = np.asarray(new_faces)
        verts = np.asarray(verts)
        verts = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    return (
        (verts * radius + np.asarray(center)).astype(np.float32),
        faces.astype(np.int32),
    )


def test_rasterizer_matches_analytic_sphere():
    """Silhouette + hit distance of a rasterized icosphere vs the analytic
    tracer on identical rays (IoU, and depth on the eroded interior where
    the polyhedral approximation error is sub-percent)."""
    H = W = 96
    focal = 1.4 * W
    center = np.array([0.05, -0.1, 0.15], np.float32)
    radius = 0.5
    verts, faces = _icosphere(center, radius, subdiv=4)
    colors = np.tile(DEFAULT_COLOR, (faces.shape[0], 1))

    pose = look_at(np.array([0.4, 0.3, 2.2], np.float32), np.zeros(3))
    rgb, depth, alpha = rasterize(verts, faces, colors, pose, H, W, focal)

    ys, xs = np.meshgrid(
        np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32),
        indexing="ij",
    )
    dirs_cam = np.stack(
        [(xs - W / 2) / focal, -(ys - H / 2) / focal, -np.ones_like(xs)], -1
    )
    norm = np.linalg.norm(dirs_cam, axis=-1)
    dirs_w = (dirs_cam / norm[..., None]).reshape(-1, 3) @ pose[:3, :3].T
    origins = np.broadcast_to(pose[:3, 3], dirs_w.shape).astype(np.float32)
    light = np.array([0.4, 0.35, -0.85], np.float32)
    light /= np.linalg.norm(light)
    _, t_ref, mask_ref = _trace_spheres(
        origins, dirs_w.astype(np.float32), [center], [radius],
        [DEFAULT_COLOR], light,
    )
    mask_ref = mask_ref.reshape(H, W)
    t_ref = t_ref.reshape(H, W)

    inter = (alpha & mask_ref).sum()
    union = (alpha | mask_ref).sum()
    assert union > 200  # sphere actually covers a meaningful patch
    iou = inter / union
    assert iou > 0.97, f"silhouette IoU {iou:.3f}"

    # camera-space -z -> distance along the unit ray
    t_raster = depth * norm
    # erode 3px: the facet-vs-sphere hit error is amplified ~1/cos(theta)
    # at grazing incidence near the rim; the interior is sub-percent
    core = mask_ref & alpha
    for _ in range(3):
        core = (
            core[1:-1, 1:-1]
            & core[:-2, 1:-1] & core[2:, 1:-1]
            & core[1:-1, :-2] & core[1:-1, 2:]
        )
        core = np.pad(core, 1)
    err = np.abs(t_raster - t_ref)[core]
    assert err.max() < 0.02 * radius + 0.01, f"depth err max {err.max():.4f}"

    # shading: rgb must be the referee's flat color scaled by a lambertian
    # factor in [ambient, 1] everywhere on the silhouette
    lit = rgb[alpha]
    assert lit.min() >= 0.3 * DEFAULT_COLOR.min() - 1e-6
    assert lit.max() <= DEFAULT_COLOR.max() + 1e-6


def test_obj_loader_polygons_negative_indices_mtl(tmp_path):
    (tmp_path / "cube.mtl").write_text(
        textwrap.dedent(
            """
            newmtl red
            Kd 0.9 0.1 0.2
            newmtl blue
            Kd 0.1 0.2 0.9
            """
        )
    )
    # a unit quad (two ways: polygon fan + negative indices) with materials
    (tmp_path / "m.obj").write_text(
        textwrap.dedent(
            """
            mtllib cube.mtl
            v 0 0 0
            v 1 0 0
            v 1 1 0
            v 0 1 0
            usemtl red
            f 1/1 2/2 3/3 4/4
            usemtl blue
            f -4//1 -3//2 -2//3
            """
        )
    )
    verts, faces, colors = load_obj(str(tmp_path / "m.obj"))
    assert verts.shape == (4, 3)
    assert faces.shape == (3, 3)  # quad fan-split into 2 + 1 explicit tri
    np.testing.assert_allclose(colors[0], [0.9, 0.1, 0.2])
    np.testing.assert_allclose(colors[1], [0.9, 0.1, 0.2])
    np.testing.assert_allclose(colors[2], [0.1, 0.2, 0.9])
    np.testing.assert_array_equal(faces[2], [0, 1, 2])


def test_normalize_mesh_contract():
    rng = np.random.default_rng(0)
    verts = rng.uniform(-3, 5, size=(50, 3)).astype(np.float32)
    out, (lo, hi), origin = normalize_mesh(verts, z_rot=1.1)
    assert abs((hi - lo).max() - 2.0) < 1e-5  # diameter 2
    assert abs(lo[2]) < 1e-5  # resting on z=0
    np.testing.assert_allclose(out.min(axis=0), lo, atol=1e-5)
    np.testing.assert_allclose(out.max(axis=0), hi, atol=1e-5)
    # origin = the OBJ origin's world position (Blender obj.location analog):
    # x/y untouched, z lifted by the rest shift, which must sit inside [lo, hi]
    assert origin[0] == origin[1] == 0.0
    assert lo[2] <= origin[2] <= hi[2]


def _write_cube_model(model_dir, color):
    os.makedirs(os.path.join(model_dir, "models"), exist_ok=True)
    with open(os.path.join(model_dir, "models", "cube.mtl"), "w") as f:
        f.write(f"newmtl m\nKd {color[0]} {color[1]} {color[2]}\n")
    v = [
        (-1, -1, -1), (1, -1, -1), (1, 1, -1), (-1, 1, -1),
        (-1, -1, 1), (1, -1, 1), (1, 1, 1), (-1, 1, 1),
    ]
    quads = [
        (1, 2, 3, 4), (5, 8, 7, 6), (1, 5, 6, 2),
        (2, 6, 7, 3), (3, 7, 8, 4), (5, 1, 4, 8),
    ]
    with open(
        os.path.join(model_dir, "models", "model_normalized.obj"), "w"
    ) as f:
        f.write("mtllib cube.mtl\nusemtl m\n")
        for x, y, z in v:
            f.write(f"v {x} {y} {z}\n")
        for q in quads:
            f.write("f " + " ".join(str(i) for i in q) + "\n")


def test_software_backend_end_to_end(tmp_path):
    """`render_shapenet_objs.py --backend software` on two cube 'models' ->
    the produced dataset loads through MultiObjectDataset with consistent
    cameras (reprojected depth at the silhouette's center ~ orbit radius)."""
    import render_shapenet_objs as rso

    from pixelnerf_tpu.data.multi_object import MultiObjectDataset

    src = tmp_path / "src"
    for i, col in enumerate([(0.8, 0.2, 0.1), (0.1, 0.4, 0.9)]):
        _write_cube_model(str(src / f"model{i:02d}"), col)
    out = tmp_path / "ds"
    args = rso._parse_args(
        [
            "--src", str(src), "--out", str(out), "--backend", "software",
            "--split", "train", "--n_scenes", "2", "--n_objects", "2",
            "--n_views", "6", "--size", "48", "--val_frac", "0",
            "--test_frac", "0", "--render_depth", "--render_alpha",
        ]
    )
    rso.software_main(args)

    scenes = sorted(os.listdir(out / "train"))
    assert len(scenes) == 2
    sdir = out / "train" / scenes[0]
    tj = json.loads((sdir / "transforms.json").read_text())
    assert len(tj["frames"]) == 6 and len(tj["model_ids"]) == 2
    for i in range(6):
        assert (sdir / f"view_{i:03d}_obj.png").exists()
        assert (sdir / f"view_{i:03d}_alpha.png").exists()
        assert (sdir / f"view_{i:03d}_depth.exr").exists()

    dset = MultiObjectDataset(str(out), stage="train")
    item = dset[0]
    imgs, poses = np.asarray(item["images"]), np.asarray(item["poses"])
    assert imgs.shape[0] == 6 and poses.shape == (6, 4, 4)
    # poses orthonormal
    rot = poses[:, :3, :3]
    np.testing.assert_allclose(
        rot @ rot.transpose(0, 2, 1), np.broadcast_to(np.eye(3), rot.shape),
        atol=1e-5,
    )
    # every view must show something
    assert np.asarray(item["masks"]).any(axis=(1, 2, 3)).all()
    # tracked orbit: every camera's implied target (pos - dist * back, with
    # the 2-object cam_dist = 6) must be the SAME point, and that lookat
    # must sit at the objects' origin height (inside the 2-unit-tall scene)
    back = poses[:, :3, 2]
    targets = poses[:, :3, 3] - 6.0 * back
    np.testing.assert_allclose(
        targets, np.broadcast_to(targets.mean(0), targets.shape), atol=1e-4
    )
    assert 0.0 < targets.mean(0)[2] < 2.0
