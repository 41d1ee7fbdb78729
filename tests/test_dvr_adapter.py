"""DVR adapter on a generated NMR-style fixture (shapenet sub-format)."""
import os

import numpy as np
import pytest

from pixelnerf_tpu.data import SyntheticSphereDataset
from pixelnerf_tpu.data.dvr import _SHAPENET_CAM, _SHAPENET_WORLD, DVRDataset


def _write_dvr_fixture(root, num_objs=2, num_views=3, size=24):
    """Build <root>/<cat>/<obj>/{image/, mask/, cameras.npz} + split lists
    such that the adapter's coordinate conversion reproduces known poses."""
    import imageio.v2 as imageio

    ds = SyntheticSphereDataset(
        num_objects=num_objs, num_views=num_views, image_size=(size, size)
    )
    cat_dir = os.path.join(root, "02958343")
    os.makedirs(cat_dir)
    names = []
    inv_world = np.linalg.inv(_SHAPENET_WORLD)
    inv_cam = np.linalg.inv(_SHAPENET_CAM)
    for i in range(num_objs):
        d = ds[i]
        obj = os.path.join(cat_dir, f"obj{i}")
        os.makedirs(os.path.join(obj, "image"))
        os.makedirs(os.path.join(obj, "mask"))
        cams = {}
        for v in range(num_views):
            img = ((d["images"][v] * 0.5 + 0.5) * 255).astype(np.uint8)
            imageio.imwrite(os.path.join(obj, "image", f"{v:04d}.png"), img)
            imageio.imwrite(
                os.path.join(obj, "mask", f"{v:04d}.png"),
                (d["masks"][v, ..., 0] * 255).astype(np.uint8),
            )
            # adapter computes pose = W @ inv(world_mat) @ C; invert that
            target = d["poses"][v]
            world_mat = np.linalg.inv(inv_world @ target @ inv_cam)
            cams[f"world_mat_{v}"] = world_mat.astype(np.float32)
            # NMR normalized intrinsics: f_pixels = intr[0,0] * width/2
            f_norm = float(d["focal"]) / (size / 2.0)
            cams[f"camera_mat_{v}"] = np.diag(
                [f_norm, f_norm, 1.0, 1.0]
            ).astype(np.float32)
        np.savez(os.path.join(obj, "cameras.npz"), **cams)
        names.append(f"obj{i}")
    for split, objs in (("train", names[:1]), ("val", names[1:]), ("test", names[1:])):
        with open(os.path.join(cat_dir, f"softras_{split}.lst"), "w") as f:
            f.write("\n".join(objs) + "\n")
    return ds


def test_dvr_shapenet_roundtrip(tmp_path):
    src = _write_dvr_fixture(str(tmp_path))
    dset = DVRDataset(str(tmp_path), stage="train", list_prefix="softras_")
    assert len(dset) == 1
    d = dset[0]
    ref = src[0]
    assert d["images"].shape == ref["images"].shape
    np.testing.assert_allclose(d["images"], ref["images"], atol=2 / 255 * 2)
    # poses round-trip exactly through the coordinate conversions
    np.testing.assert_allclose(d["poses"], ref["poses"], atol=1e-4)
    np.testing.assert_allclose(float(d["focal"]), float(ref["focal"]), rtol=1e-5)
    assert d["masks"].shape == ref["masks"].shape
    assert d["bbox"].shape == (3, 4)
    # splits resolve to disjoint objects
    val = DVRDataset(str(tmp_path), stage="val", list_prefix="softras_")
    assert len(val) == 1 and val.all_objs[0][1] != dset.all_objs[0][1]


def _write_dtu_fixture(root, num_views=4, size=20):
    """DTU sub-format: cameras.npz holds P = K [R | t] projection matrices."""
    import imageio.v2 as imageio

    ds = SyntheticSphereDataset(num_objects=1, num_views=num_views,
                                image_size=(size, size))
    d = ds[0]
    scan = os.path.join(root, "scan1", "objA")
    os.makedirs(os.path.join(scan, "image"))
    os.makedirs(os.path.join(scan, "mask"))
    F = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)[:3, :3]
    fx = fy = float(d["focal"])
    cx = cy = size / 2.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]], np.float32)
    cams = {}
    flip4 = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    for v in range(num_views):
        img = ((d["images"][v] * 0.5 + 0.5) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(scan, "image", f"{v:04d}.png"), img)
        imageio.imwrite(
            os.path.join(scan, "mask", f"{v:04d}.png"),
            (d["masks"][v, ..., 0] * 255).astype(np.uint8),
        )
        # adapter: decompose P -> c2w, then FLIP @ pose @ FLIP; invert that
        target = d["poses"][v]
        pose = flip4 @ target @ flip4              # pre-flip c2w
        R_w2c = pose[:3, :3].T
        t = -R_w2c @ pose[:3, 3]
        P = K @ np.concatenate([R_w2c, t[:, None]], axis=1)
        cams[f"world_mat_{v}"] = P.astype(np.float32)
    np.savez(os.path.join(scan, "cameras.npz"), **cams)
    with open(os.path.join(root, "scan1", "new_train.lst"), "w") as f:
        f.write("objA\n")
    return ds


def test_dvr_dtu_roundtrip(tmp_path):
    src = _write_dtu_fixture(str(tmp_path))
    dset = DVRDataset(
        str(tmp_path), stage="train", list_prefix="new_", sub_format="dtu",
        scale_focal=False, z_near=0.1, z_far=5.0,
    )
    d = dset[0]
    ref = src[0]
    np.testing.assert_allclose(d["poses"], ref["poses"], atol=1e-3)
    # averaged intrinsics come back as (2,) focal and principal point
    np.testing.assert_allclose(
        np.asarray(d["focal"]), [float(ref["focal"])] * 2, rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(d["c"]), [10.0, 10.0], atol=1e-3)
    assert "bbox" not in d  # dtu path discards bboxes (reference :238)
    assert dset.z_near == 0.1 and dset.z_far == 5.0


def test_dvr_factory_flags():
    from pixelnerf_tpu.data import get_split_dataset

    with pytest.raises(AssertionError):
        get_split_dataset("dvr", "/nonexistent_dir_xyz", want_split="train")
