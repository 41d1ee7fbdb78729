"""grid_sample vs torch.nn.functional.grid_sample golden values."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pixelnerf_tpu.ops.grid_sample import grid_sample


def _compare(mode, padding_mode, align_corners, out_of_bounds=False):
    rng = np.random.default_rng(42)
    N, H, W, C, P = 3, 9, 13, 5, 57
    feats = rng.normal(size=(N, H, W, C)).astype(np.float32)
    lim = 2.5 if out_of_bounds else 1.0
    grid = rng.uniform(-lim, lim, size=(N, P, 2)).astype(np.float32)

    ours = np.asarray(
        grid_sample(
            feats, grid, mode=mode, padding_mode=padding_mode,
            align_corners=align_corners,
        )
    )
    t_feats = torch.tensor(feats).permute(0, 3, 1, 2)  # NCHW
    t_grid = torch.tensor(grid).unsqueeze(2)           # (N, P, 1, 2)
    theirs = F.grid_sample(
        t_feats, t_grid, mode=mode, padding_mode=padding_mode,
        align_corners=align_corners,
    )[:, :, :, 0].permute(0, 2, 1).numpy()             # (N, P, C)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["border", "zeros", "reflection"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_bilinear_in_bounds(padding_mode, align_corners):
    _compare("bilinear", padding_mode, align_corners)


@pytest.mark.parametrize("padding_mode", ["border", "zeros", "reflection"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_bilinear_out_of_bounds(padding_mode, align_corners):
    _compare("bilinear", padding_mode, align_corners, out_of_bounds=True)


def test_nearest_border():
    _compare("nearest", "border", True)


def test_gradients_flow():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1, 1, size=(1, 8, 2)).astype(np.float32))

    def loss(f):
        return jnp.sum(grid_sample(f, grid) ** 2)

    g = jax.grad(loss)(feats)
    assert g.shape == feats.shape
    assert float(jnp.sum(jnp.abs(g))) > 0.0


def test_pixel_center_exact():
    """align_corners=True: grid value at corner (-1,-1) hits pixel (0,0)."""
    feats = np.arange(12, dtype=np.float32).reshape(1, 3, 4, 1)
    grid = np.array([[[-1.0, -1.0], [1.0, 1.0], [0.0, 0.0]]], dtype=np.float32)
    out = np.asarray(grid_sample(feats, grid))
    assert out[0, 0, 0] == feats[0, 0, 0, 0]
    assert out[0, 1, 0] == feats[0, 2, 3, 0]


def test_grid_sample_broadcasts_single_feature_map():
    """features N=1 sampled by Ng>1 grids — broadcast tolerance the flat
    offset-indexed formulation must preserve (regression: round-3 refactor
    raised a reshape error here)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.normal(size=(1, 6, 7, 9)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.2, 1.2, (4, 11, 2)).astype(np.float32))
    out = grid_sample(feats, grid, "bilinear", "border", True)
    assert out.shape == (4, 11, 9)
    ref = grid_sample(
        jnp.broadcast_to(feats, (4, 6, 7, 9)), grid, "bilinear", "border", True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
