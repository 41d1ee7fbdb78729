"""Separable-matmul resize vs torch F.interpolate golden values."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pixelnerf_tpu.ops.resize import resize_area, resize_bilinear


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("shape", [((5, 7), (10, 14)), ((4, 4), (9, 13)), ((8, 6), (3, 2))])
def test_bilinear(align_corners, shape):
    (h, w), (oh, ow) = shape
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(x, oh, ow, align_corners=align_corners))
    theirs = (
        F.interpolate(
            torch.tensor(x).permute(0, 3, 1, 2), (oh, ow),
            mode="bilinear", align_corners=align_corners,
        ).permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("shape", [((8, 8), (4, 4)), ((9, 12), (3, 5)), ((10, 10), (7, 7))])
def test_area(shape):
    (h, w), (oh, ow) = shape
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
    ours = np.asarray(resize_area(x, oh, ow))
    theirs = (
        F.adaptive_avg_pool2d(torch.tensor(x).permute(0, 3, 1, 2), (oh, ow))
        .permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
