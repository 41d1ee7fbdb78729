"""Renderer semantics: sampling laws + compositing vs analytic/NumPy referee."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_tpu.render import (
    RenderConfig,
    composite,
    render_rays,
    sample_coarse,
    sample_fine,
    sample_fine_depth,
)
from pixelnerf_tpu.render.renderer import render_rays_chunked


def _rays(B=16, near=1.0, far=3.0, SB=1):
    rays = np.zeros((SB, B, 8), np.float32)
    rays[..., 2] = 2.0          # origin z
    rays[..., 5] = -1.0         # direction -z
    rays[..., 6] = near
    rays[..., 7] = far
    return jnp.asarray(rays)


def test_sample_coarse_stratified():
    cfg = RenderConfig(n_coarse=32)
    rays = _rays()
    z = np.asarray(sample_coarse(jax.random.PRNGKey(0), rays, cfg))[0]
    assert z.shape == (16, 32)
    assert z.min() >= 1.0 and z.max() <= 3.0
    # one sample per stratified bin
    bins = np.linspace(1.0, 3.0, 33)
    for r in z:
        idx = np.searchsorted(bins, r) - 1
        assert (idx == np.arange(32)).all()


def test_sample_coarse_lindisp():
    cfg = RenderConfig(n_coarse=64, lindisp=True)
    z = np.asarray(sample_coarse(jax.random.PRNGKey(1), _rays(), cfg))
    assert z.min() >= 1.0 and z.max() <= 3.0
    # disparity-linear: samples denser near the camera
    assert (z < 2.0).mean() > 0.6


def test_sample_fine_importance():
    """Mass concentrated in one coarse bin -> fine samples land there."""
    cfg = RenderConfig(n_coarse=32, n_fine=64)
    rays = _rays(B=4)
    weights = np.zeros((1, 4, 32), np.float32)
    weights[..., 10] = 1.0  # bin 10 of 32 in [1, 3] -> z in [1.625, 1.6875]
    z = np.asarray(sample_fine(jax.random.PRNGKey(2), rays, jnp.asarray(weights), cfg))
    frac_in_bin = ((z >= 1.625 - 1e-5) & (z <= 1.6875 + 1e-5)).mean()
    assert frac_in_bin > 0.95


def test_sample_fine_depth_clamped():
    cfg = RenderConfig(n_fine_depth=16, depth_std=0.5)
    rays = _rays(B=8)
    depth = jnp.full((1, 8), 1.05)
    z = np.asarray(sample_fine_depth(jax.random.PRNGKey(3), rays, depth, cfg))
    assert z.shape == (1, 8, 16)
    assert z.min() >= 1.0 and z.max() <= 3.0


def _numpy_composite(rgbs, sigmas, z, far, white_bkgd=False):
    """Independent alpha-compositing referee (published NeRF equations with
    the reference's delta_inf = far - z_K convention)."""
    deltas = np.concatenate([z[..., 1:] - z[..., :-1], far - z[..., -1:]], -1)
    alphas = 1.0 - np.exp(-deltas * np.maximum(sigmas, 0.0))
    shifted = np.concatenate(
        [np.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-10], -1
    )
    T = np.cumprod(shifted, -1)
    w = alphas * T[..., :-1]
    rgb = (w[..., None] * rgbs).sum(-2)
    depth = (w * z).sum(-1)
    if white_bkgd:
        rgb = rgb + (1.0 - w.sum(-1))[..., None]
    return w, rgb, depth


@pytest.mark.parametrize("white_bkgd", [False, True])
def test_composite_matches_referee(white_bkgd):
    rng = np.random.default_rng(0)
    SB, B, K = 2, 8, 16
    rays = np.asarray(_rays(B=B, SB=SB))
    z = np.sort(rng.uniform(1.0, 3.0, size=(SB, B, K)).astype(np.float32), -1)
    rgbs = rng.uniform(0, 1, size=(SB, B, K, 3)).astype(np.float32)
    sigmas = rng.uniform(0, 5, size=(SB, B, K)).astype(np.float32)

    def query_fn(points, viewdirs, coarse):
        assert points.shape == (SB, B * K, 3)
        out = np.concatenate([rgbs, sigmas[..., None]], -1).reshape(SB, B * K, 4)
        return jnp.asarray(out)

    cfg = RenderConfig(n_coarse=K, white_bkgd=white_bkgd)
    out = composite(query_fn, jnp.asarray(rays), jnp.asarray(z), True, cfg)
    w_ref, rgb_ref, depth_ref = _numpy_composite(
        rgbs, sigmas, z, rays[..., 7:8], white_bkgd
    )
    np.testing.assert_allclose(np.asarray(out["weights"]), w_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), depth_ref, atol=1e-5)


def test_opaque_wall_depth():
    """A dense slab at z=2 should composite to its own color and depth~2."""
    SB, B = 1, 4
    rays = _rays(B=B)
    cfg = RenderConfig(n_coarse=128)

    def query_fn(points, viewdirs, coarse):
        # world z of each point; slab occupies z in [-0.05, 0.05] world,
        # i.e. ray depth near 2.0 (origin z=2, dir -z)
        pz = points[..., 2]
        sigma = jnp.where(jnp.abs(pz) < 0.05, 500.0, 0.0)
        rgb_logit = jnp.full(points.shape[:-1] + (3,), 3.0)  # sigmoid->0.95
        return jnp.concatenate([rgb_logit * 0 + 0.8, sigma[..., None]], -1)

    out = render_rays(query_fn, rays, jax.random.PRNGKey(0), cfg)
    depth = np.asarray(out["coarse"]["depth"])
    np.testing.assert_allclose(depth, 1.95, atol=0.05)
    np.testing.assert_allclose(np.asarray(out["coarse"]["rgb"]), 0.8, atol=0.02)


def test_hierarchical_output_keys():
    cfg = RenderConfig(n_coarse=16, n_fine=8, n_fine_depth=4)
    calls = []

    def query_fn(points, viewdirs, coarse):
        calls.append((points.shape, coarse))
        return jnp.concatenate(
            [jnp.full(points.shape[:-1] + (3,), 0.5),
             jnp.ones(points.shape[:-1] + (1,))], -1
        )

    out = render_rays(
        query_fn, _rays(B=4), jax.random.PRNGKey(1), cfg, want_weights=True
    )
    assert set(out.keys()) == {"coarse", "fine"}
    assert out["coarse"]["weights"].shape == (1, 4, 16)
    # fine pass: sorted union of 16 coarse + 4 importance + 4 depth = 24
    assert out["fine"]["weights"].shape == (1, 4, 24)
    assert calls[0] == ((1, 4 * 16, 3), True)
    assert calls[1] == ((1, 4 * 24, 3), False)


def test_chunked_matches_unchunked():
    cfg = RenderConfig(n_coarse=8, n_fine=4, n_fine_depth=2)

    def query_fn(points, viewdirs, coarse):
        sigma = jnp.sum(points**2, -1, keepdims=True)
        rgb = jnp.tanh(points)
        return jnp.concatenate([rgb * 0.5 + 0.5, sigma], -1)

    rays = _rays(B=32)
    # NOTE: chunked uses per-chunk rng keys, so use a deterministic query and
    # compare structure + near-equality of a rng-free cfg? Sampling is random;
    # instead check shapes and that values are finite and in range.
    out = render_rays_chunked(query_fn, rays, jax.random.PRNGKey(4), cfg, ray_chunk=8)
    assert out["fine"]["rgb"].shape == (1, 32, 3)
    r = np.asarray(out["fine"]["rgb"])
    assert np.isfinite(r).all() and r.min() >= 0.0 and r.max() <= 1.0


def test_staged_render_matches_plain():
    """The staged (features/mlp split, coarse-feature-reuse) render path must
    be bit-identical to the plain path: same sample draws, same field values,
    outputs permuted by argsort(z) instead of queried in sorted order."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np

    from pixelnerf_tpu.config import load_config
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.utils import geometry

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = load_config(os.path.join(REPO, "conf", "exp", "sn64.conf"))
    conf["model"]["mlp_coarse"]["d_hidden"] = 64
    conf["model"]["mlp_fine"]["d_hidden"] = 64
    conf["model"]["encoder"]["num_layers"] = 2
    net = make_model(conf["model"])

    rng = np.random.default_rng(7)
    SB, NS, H, W = 2, 2, 32, 32
    images = jnp.asarray(rng.uniform(-1, 1, (SB, NS, H, W, 3)).astype(np.float32))
    poses = jnp.asarray(
        np.stack(
            [
                np.stack(
                    [
                        geometry.look_at(
                            np.array([0.4 * v + 0.1, 0.2, 2.0], np.float32),
                            np.zeros(3),
                        )
                        for v in range(NS)
                    ]
                )
                for _ in range(SB)
            ]
        )
    )
    focal = jnp.asarray(np.float32(40.0))
    variables = net.init(
        jax.random.PRNGKey(0), images, poses, focal,
        jnp.zeros((SB, 8, 3)), jnp.ones((SB, 8, 3)),
    )
    enc = net.apply(variables, images, poses, focal, method=net.encode)
    rays = geometry.gen_rays(poses[:, 0], W, H, focal, 1.0, 3.0).reshape(SB, -1, 8)
    rays = rays[:, :64]
    cfg = RenderConfig(n_coarse=8, n_fine=6, n_fine_depth=3, white_bkgd=True)

    def query_fn(xyz, viewdirs, coarse):
        return net.apply(
            variables, enc, xyz, viewdirs=viewdirs, coarse=coarse,
            method=net.query,
        )

    def features_fn(xyz, viewdirs):
        return net.apply(
            variables, enc, xyz, viewdirs=viewdirs, method=net.query_features
        )

    def mlp_fn(feats, coarse):
        return net.apply(
            variables, enc, feats, coarse=coarse, method=net.query_mlp
        )

    key = jax.random.PRNGKey(3)
    plain = render_rays(query_fn, rays, key, cfg, want_weights=True)
    staged = render_rays((features_fn, mlp_fn), rays, key, cfg, want_weights=True)
    for branch in ("coarse", "fine"):
        for k in plain[branch]:
            np.testing.assert_allclose(
                np.asarray(staged[branch][k]),
                np.asarray(plain[branch][k]),
                atol=1e-5,
                rtol=1e-5,
                err_msg=f"{branch}/{k}",
            )
