"""Data layer: synthetic dataset, adapters on generated fixtures, pipeline."""
import json
import os

import numpy as np
import pytest

from pixelnerf_tpu.data import (
    ColorJitterDataset,
    MultiObjectDataset,
    RayBatchPipeline,
    SRNDataset,
    SyntheticSphereDataset,
    gen_rays_at,
    get_split_dataset,
)


def test_synthetic_schema():
    ds = SyntheticSphereDataset(num_objects=2, num_views=4, image_size=(32, 32))
    assert len(ds) == 2
    d = ds[0]
    assert d["images"].shape == (4, 32, 32, 3)
    assert d["poses"].shape == (4, 4, 4)
    assert d["masks"].shape == (4, 32, 32, 1)
    assert d["bbox"].shape == (4, 4)
    assert -1.0 <= d["images"].min() and d["images"].max() <= 1.0
    # deterministic
    d2 = SyntheticSphereDataset(num_objects=2, num_views=4, image_size=(32, 32))[0]
    np.testing.assert_array_equal(d["images"], d2["images"])
    # object visible in every view
    assert all(d["masks"][v].sum() > 10 for v in range(4))


def test_synthetic_stages_differ():
    tr = SyntheticSphereDataset(num_objects=1, num_views=2, stage="train")[0]
    te = SyntheticSphereDataset(num_objects=1, num_views=2, stage="test")[0]
    assert np.abs(tr["images"] - te["images"]).max() > 0.01


def test_gen_rays_at_matches_full_gen_rays():
    from pixelnerf_tpu.utils import geometry

    ds = SyntheticSphereDataset(num_objects=1, num_views=3, image_size=(16, 16))
    d = ds[0]
    full = np.asarray(
        geometry.gen_rays(
            d["poses"], 16, 16, d["focal"], ds.z_near, ds.z_far, c=d["c"]
        )
    )  # (NV, H, W, 8)
    rng = np.random.default_rng(0)
    pix = np.stack(
        [rng.integers(0, 3, 20), rng.integers(0, 16, 20), rng.integers(0, 16, 20)], -1
    )
    rays = gen_rays_at(d["poses"], pix, d["focal"], d["c"], ds.z_near, ds.z_far)
    expect = full[pix[:, 0], pix[:, 1], pix[:, 2]]
    np.testing.assert_allclose(rays, expect, atol=1e-5)


def test_pipeline_batch_shapes():
    ds = SyntheticSphereDataset(num_objects=3, num_views=5, image_size=(32, 32))
    pipe = RayBatchPipeline(ds, batch_size=2, rays_per_object=64, views=(2,), prefetch=0)
    batch = next(iter(pipe))
    assert batch["images"].shape == (2, 2, 32, 32, 3)
    assert batch["poses"].shape == (2, 2, 4, 4)
    assert batch["rays"].shape == (2, 64, 8)
    assert batch["rgb_gt"].shape == (2, 64, 3)
    assert 0.0 <= batch["rgb_gt"].min() and batch["rgb_gt"].max() <= 1.0
    assert batch["focal"].shape == (2,)
    assert batch["c"].shape == (2, 2)


def test_pipeline_bbox_phase_biases_sampling():
    ds = SyntheticSphereDataset(num_objects=1, num_views=4, image_size=(64, 64))
    d = ds[0]
    def nonwhite_frac(no_bbox_step):
        pipe = RayBatchPipeline(ds, batch_size=1, rays_per_object=2048, views=(1,),
                                no_bbox_step=no_bbox_step, prefetch=0, seed=1)
        batch = next(iter(pipe))
        return (batch["rgb_gt"] < 0.98).any(-1).mean()

    # bbox-biased phase hits foreground notably more often than uniform phase
    assert nonwhite_frac(10**9) > 1.3 * nonwhite_frac(0)


def test_pipeline_prefetch_thread():
    ds = SyntheticSphereDataset(num_objects=2, num_views=3, image_size=(16, 16))
    pipe = RayBatchPipeline(ds, batch_size=1, rays_per_object=16, views=(1,), prefetch=2)
    it = iter(pipe)
    batches = [next(it) for _ in range(5)]
    assert len(batches) == 5


def _write_srn_fixture(root):
    """Generate a tiny SRN-layout dataset from the synthetic renderer."""
    import imageio.v2 as imageio

    ds = SyntheticSphereDataset(num_objects=2, num_views=3, image_size=(32, 32))
    base = os.path.join(root, "cars_train")
    for i in range(2):
        d = ds[i]
        obj = os.path.join(base, f"obj{i}")
        os.makedirs(os.path.join(obj, "rgb"))
        os.makedirs(os.path.join(obj, "pose"))
        with open(os.path.join(obj, "intrinsics.txt"), "w") as f:
            f.write(f"{d['focal']} {d['c'][0]} {d['c'][1]} 0.\n0. 0. 0.\n1.\n32 32\n")
        flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
        for v in range(3):
            img = ((d["images"][v] * 0.5 + 0.5) * 255).astype(np.uint8)
            imageio.imwrite(os.path.join(obj, "rgb", f"{v:06d}.png"), img)
            # SRN poses are stored pre-flip; adapter multiplies by diag(1,-1,-1,1)
            np.savetxt(os.path.join(obj, "pose", f"{v:06d}.txt"),
                       (d["poses"][v] @ flip).reshape(1, 16))
    return os.path.join(root, "cars")


def test_srn_adapter(tmp_path):
    path = _write_srn_fixture(str(tmp_path))
    ds = SRNDataset(path, stage="train", image_size=(32, 32))
    assert len(ds) == 2
    d = ds[0]
    assert d["images"].shape == (3, 32, 32, 3)
    assert d["poses"].shape == (3, 4, 4)
    assert d["bbox"].shape == (3, 4)
    assert ds.z_near == 0.8 and ds.z_far == 1.8
    # poses round-trip through the coord flip: rotation orthonormal
    R = d["poses"][0, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    # reconstructed images match the synthetic source (lossless png, no resize)
    src = SyntheticSphereDataset(num_objects=2, num_views=3, image_size=(32, 32))[0]
    np.testing.assert_allclose(d["images"], src["images"], atol=2 / 255 * 2)


def test_multi_object_adapter(tmp_path):
    import imageio.v2 as imageio

    ds_src = SyntheticSphereDataset(num_objects=1, num_views=2, image_size=(24, 24))
    d = ds_src[0]
    scene = tmp_path / "train" / "scene0"
    scene.mkdir(parents=True)
    frames = []
    for v in range(2):
        rgba = np.concatenate(
            [
                ((d["images"][v] * 0.5 + 0.5) * 255).astype(np.uint8),
                (d["masks"][v] * 255).astype(np.uint8),
            ],
            axis=-1,
        )
        imageio.imwrite(str(scene / f"view_{v}_obj.png"), rgba)
        frames.append(
            {"file_path": f"./view_{v}", "transform_matrix": d["poses"][v].tolist()}
        )
    cax = 2 * np.arctan(24 / (2 * float(d["focal"])))
    (scene / "transforms.json").write_text(
        json.dumps({"camera_angle_x": cax, "frames": frames})
    )
    ds = MultiObjectDataset(str(tmp_path), stage="train")
    out = ds[0]
    assert out["images"].shape == (2, 24, 24, 3)
    np.testing.assert_allclose(float(out["focal"]), float(d["focal"]), rtol=1e-5)
    # white-composited over alpha: background exactly 1.0 in [-1,1] space
    bg = out["images"][0][~d["masks"][0, ..., 0].astype(bool)]
    np.testing.assert_allclose(bg, 1.0, atol=2 / 255 * 2)


def test_color_jitter_consistency():
    ds = SyntheticSphereDataset(num_objects=1, num_views=4, image_size=(16, 16))
    jds = ColorJitterDataset(ds, seed=3)
    d0 = ds[0]
    d1 = jds[0]
    assert d1["images"].shape == d0["images"].shape
    assert np.abs(d1["images"] - d0["images"]).max() > 1e-3  # something changed
    assert d1["images"].min() >= -1.0 - 1e-6 and d1["images"].max() <= 1.0 + 1e-6
    # same jitter across views: per-view mean shift should be highly correlated
    shift = (d1["images"] - d0["images"]).reshape(4, -1).mean(-1)
    assert np.abs(shift - shift.mean()).max() < 0.05


def test_factory_synthetic():
    train, val, test = get_split_dataset("synthetic", None, num_objects=2, num_views=3)
    assert len(train) == 2 and len(val) == 2 and len(test) == 2
    assert train.z_near == 1.0


def test_pipeline_step_counts_batches():
    """self.step advances one per batch = one optimizer step (reference
    train.py compares global_step to no_bbox_step), not per object."""
    ds = SyntheticSphereDataset(num_objects=3, num_views=4, image_size=(16, 16))
    pipe = RayBatchPipeline(ds, batch_size=4, rays_per_object=8, views=(1,), prefetch=0)
    it = pipe.batches()
    b0 = next(it)
    b1 = next(it)
    assert b0["step"] == 0
    assert b1["step"] == 1
    # resume path: curriculum counter can be re-seated from a TrainState step
    pipe.step = 117
    assert next(it)["step"] == 117
