"""SRN ShapeNet dataset adapter (Sitzmann et al.).

Layout ``<path>_<stage>/<obj>/{intrinsics.txt, rgb/*, pose/*}`` with a
white-background mask inferred from non-white pixels and per-view tight
bboxes — semantics of reference src/data/SRNDataset.py, NHWC numpy output.
"""
from __future__ import annotations

import glob
import os

import numpy as np

from .base import DatasetBase, image_to_tensor, mask_bbox, resize_area_np

# SRN poses are OpenCV-style (y down, z forward); flip to our y-up/-z
# convention (reference SRNDataset.py:46-48).
_COORD_TRANS = np.diag(np.array([1.0, -1.0, -1.0, 1.0], dtype=np.float32))


class SRNDataset(DatasetBase):
    def __init__(
        self, path, stage="train", image_size=(128, 128), world_scale=1.0,
        z_near=None, z_far=None, cache_cap=0,
    ):
        self.base_path = path + "_" + stage
        self.dataset_name = os.path.basename(path)
        self.stage = stage
        assert os.path.exists(self.base_path), self.base_path

        is_chair = "chair" in self.dataset_name
        if is_chair and stage == "train":
            # SRN's public chair set nests the training objects one level down
            tmp = os.path.join(self.base_path, "chairs_2.0_train")
            if os.path.exists(tmp):
                self.base_path = tmp

        self.intrins = sorted(
            glob.glob(os.path.join(self.base_path, "*", "intrinsics.txt"))
        )
        self.image_size = image_size
        self.world_scale = world_scale

        if is_chair:
            self.z_near, self.z_far = 1.25, 2.75
        else:
            self.z_near, self.z_far = 0.8, 1.8
        # explicit bounds (e.g. --override data.z_near=1.0) beat the
        # class-name defaults — needed when SRN-layout data holds scenes
        # with other depth ranges (the reference hardcodes per-class bounds,
        # SRNDataset.py:50-55)
        if z_near is not None:
            self.z_near = float(z_near)
        if z_far is not None:
            self.z_far = float(z_far)
        self.lindisp = False
        # opt-in decoded-object cache (--override data.cache_cap=N): the
        # reference re-decodes per pull (SRNDataset.py), which starves a
        # TPU step loop on a small host — see DatasetBase._cache_setup
        self._cache_setup(cache_cap)

    def __len__(self):
        return len(self.intrins)

    def __getitem__(self, index):
        import imageio.v2 as imageio

        cached = self._cache_get(index)
        if cached is not None:
            return cached

        intrin_path = self.intrins[index]
        dir_path = os.path.dirname(intrin_path)
        rgb_paths = sorted(glob.glob(os.path.join(dir_path, "rgb", "*")))
        pose_paths = sorted(glob.glob(os.path.join(dir_path, "pose", "*")))
        assert len(rgb_paths) == len(pose_paths)

        with open(intrin_path, "r") as f:
            lines = f.readlines()
            focal, cx, cy, _ = map(float, lines[0].split())

        imgs, poses, masks, bboxes = [], [], [], []
        for rgb_path, pose_path in zip(rgb_paths, pose_paths):
            img = imageio.imread(rgb_path)[..., :3]
            mask = (img != 255).all(axis=-1)[..., None].astype(np.float32)
            pose = np.loadtxt(pose_path, dtype=np.float32).reshape(4, 4)
            imgs.append(image_to_tensor(img))
            masks.append(mask)
            poses.append(pose @ _COORD_TRANS)
            bboxes.append(mask_bbox(mask))

        images = np.stack(imgs)
        masks = np.stack(masks)
        poses = np.stack(poses)
        bboxes = np.stack(bboxes)

        if images.shape[1:3] != tuple(self.image_size):
            scale = self.image_size[0] / images.shape[1]
            focal *= scale
            cx *= scale
            cy *= scale
            bboxes *= scale
            images = resize_area_np(images, *self.image_size)
            masks = resize_area_np(masks, *self.image_size)

        if self.world_scale != 1.0:
            # scales focal as well as translation, matching the reference's
            # convention (SRNDataset.py:121-123)
            focal *= self.world_scale
            poses[:, :3, 3] *= self.world_scale

        return self._cache_put(index, {
            "path": dir_path,
            "img_id": index,
            "focal": np.float32(focal),
            "c": np.array([cx, cy], dtype=np.float32),
            "images": images.astype(np.float32),
            "masks": masks.astype(np.float32),
            "bbox": bboxes.astype(np.float32),
            "poses": poses.astype(np.float32),
        })
