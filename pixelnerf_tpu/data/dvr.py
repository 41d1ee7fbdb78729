"""DVR dataset adapter (Niemeyer et al.): NMR/3D-R2N2 ShapeNet renderings and
DTU real scenes.

Two sub-formats (reference src/data/DVRDataset.py):
- ``shapenet``: pose from world_mat_inv (or inverted world_mat), focal from
  camera_mat; asserts fx == fy; focal optionally rescaled from the [-1, 1]
  NMR convention (``scale_focal``).
- ``dtu``: decompose P = K[R|t] per view, normalize K, apply scale_mat
  normalization to the translation, then average intrinsics over all views
  of the object (per-view intrinsics are intentionally discarded, matching
  the reference DVRDataset.py:231-238).
"""
from __future__ import annotations

import glob
import os

import numpy as np

from .base import DatasetBase, image_to_tensor, mask_bbox, mask_to_tensor, resize_area_np

_SHAPENET_WORLD = np.array(
    [[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float32
)
_SHAPENET_CAM = np.array(
    [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]], dtype=np.float32
)
_DTU_FLIP = np.array(
    [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]], dtype=np.float32
)


def _decompose_projection(P: np.ndarray):
    """P (3,4) = K [R | t] -> (K, R, camera_center) via RQ decomposition."""
    import cv2

    K, R, t = cv2.decomposeProjectionMatrix(P)[:3]
    K = K / K[2, 2]
    return K, R, (t[:3] / t[3])[:, 0]


class DVRDataset(DatasetBase):
    def __init__(
        self,
        path,
        stage="train",
        list_prefix="softras_",
        image_size=None,
        sub_format="shapenet",
        scale_focal=True,
        max_imgs=100000,
        z_near=1.2,
        z_far=4.0,
        seed=1234,
        cache_cap=0,
    ):
        self.base_path = path
        assert os.path.exists(path), path
        cats = [x for x in glob.glob(os.path.join(path, "*")) if os.path.isdir(x)]
        file_lists = [os.path.join(x, f"{list_prefix}{stage}.lst") for x in cats]

        all_objs = []
        for file_list in file_lists:
            if not os.path.exists(file_list):
                continue
            base_dir = os.path.dirname(file_list)
            cat = os.path.basename(base_dir)
            with open(file_list, "r") as f:
                all_objs.extend(
                    (cat, os.path.join(base_dir, x.strip())) for x in f if x.strip()
                )
        self.all_objs = all_objs
        self.stage = stage
        self.image_size = image_size
        self.sub_format = sub_format
        self.scale_focal = scale_focal
        self.max_imgs = max_imgs
        self.z_near = z_near
        self.z_far = z_far
        self.lindisp = False
        # opt-in decoded-object cache (--override data.cache_cap=N); objects
        # subject to max_imgs random subsampling are never cached so the
        # per-epoch re-draw semantics (reference DVRDataset max_imgs) hold
        self._cache_setup(cache_cap)
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.all_objs)

    def __getitem__(self, index):
        import imageio.v2 as imageio

        cached = self._cache_get(index)
        if cached is not None:
            return cached

        cat, root_dir = self.all_objs[index]
        rgb_paths = sorted(
            x
            for x in glob.glob(os.path.join(root_dir, "image", "*"))
            if x.endswith((".jpg", ".png"))
        )
        mask_paths = sorted(glob.glob(os.path.join(root_dir, "mask", "*.png")))
        if len(mask_paths) == 0:
            mask_paths = [None] * len(rgb_paths)

        cacheable = len(rgb_paths) <= self.max_imgs
        if cacheable:
            sel_indices = np.arange(len(rgb_paths))
        else:
            sel_indices = self._rng.choice(len(rgb_paths), self.max_imgs, replace=False)
            rgb_paths = [rgb_paths[i] for i in sel_indices]
            mask_paths = [mask_paths[i] for i in sel_indices]

        all_cam = np.load(os.path.join(root_dir, "cameras.npz"))

        imgs, poses, masks, bboxes = [], [], [], []
        focal = None
        fx = fy = cx = cy = 0.0
        has_masks = mask_paths[0] is not None

        for idx, (rgb_path, mask_path) in enumerate(zip(rgb_paths, mask_paths)):
            i = sel_indices[idx]
            img = imageio.imread(rgb_path)[..., :3]
            if self.scale_focal:
                x_scale = img.shape[1] / 2.0
                y_scale = img.shape[0] / 2.0
                xy_delta = 1.0
            else:
                x_scale = y_scale = 1.0
                xy_delta = 0.0

            if self.sub_format == "dtu":
                K, R, t = _decompose_projection(all_cam[f"world_mat_{i}"][:3])
                pose = np.eye(4, dtype=np.float32)
                pose[:3, :3] = R.T
                pose[:3, 3] = t
                scale_mtx = all_cam.get(f"scale_mat_{i}")
                if scale_mtx is not None:
                    norm_trans = scale_mtx[:3, 3]
                    norm_scale = np.diagonal(scale_mtx[:3, :3])
                    pose[:3, 3] = (pose[:3, 3] - norm_trans) / norm_scale
                fx += K[0, 0] * x_scale
                fy += K[1, 1] * y_scale
                cx += (K[0, 2] + xy_delta) * x_scale
                cy += (K[1, 2] + xy_delta) * y_scale
                pose = _DTU_FLIP @ pose @ _DTU_FLIP
            else:
                inv_key, key = f"world_mat_inv_{i}", f"world_mat_{i}"
                if inv_key in all_cam:
                    pose = all_cam[inv_key]
                else:
                    m = all_cam[key]
                    if m.shape[0] == 3:
                        m = np.vstack([m, np.array([0, 0, 0, 1.0])])
                    pose = np.linalg.inv(m)
                intr = all_cam[f"camera_mat_{i}"]
                f_i = intr[0, 0]
                assert abs(intr[0, 0] - intr[1, 1]) < 1e-9, "expected fx == fy"
                f_i = f_i * x_scale
                if focal is None:
                    focal = f_i
                else:
                    assert abs(f_i - focal) < 1e-5, "inconsistent focal across views"
                pose = _SHAPENET_WORLD @ pose.astype(np.float32) @ _SHAPENET_CAM

            imgs.append(image_to_tensor(img))
            poses.append(pose.astype(np.float32))
            if has_masks and mask_path is not None:
                mask = imageio.imread(mask_path)
                mask = mask_to_tensor(mask)
                masks.append(mask)
                bboxes.append(mask_bbox(mask))

        images = np.stack(imgs).astype(np.float32)
        poses = np.stack(poses)

        result = {"path": root_dir, "img_id": index, "poses": poses}
        c = None
        if self.sub_format == "dtu":
            n = len(rgb_paths)
            focal = np.array([fx / n, fy / n], dtype=np.float32)
            c = np.array([cx / n, cy / n], dtype=np.float32)
            bboxes = None
        else:
            focal = np.float32(focal)
            bboxes = np.stack(bboxes).astype(np.float32) if bboxes else None

        masks_arr = np.stack(masks).astype(np.float32) if masks else None

        if self.image_size is not None and images.shape[1:3] != tuple(self.image_size):
            scale = self.image_size[0] / images.shape[1]
            focal = focal * scale
            if c is not None:
                c = c * scale
            if bboxes is not None:
                bboxes = bboxes * scale
            images = resize_area_np(images, *self.image_size)
            if masks_arr is not None:
                masks_arr = resize_area_np(masks_arr, *self.image_size)

        result["focal"] = focal
        result["images"] = images
        if c is not None:
            result["c"] = c
        if masks_arr is not None:
            result["masks"] = masks_arr
        if bboxes is not None:
            result["bbox"] = bboxes
        return self._cache_put(index, result) if cacheable else result
