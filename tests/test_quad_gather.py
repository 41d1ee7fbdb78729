"""Quad-corner gather equals the 4-gather bilinear/border grid sample."""
import jax
import jax.numpy as jnp
import numpy as np

from pixelnerf_tpu.ops.grid_sample import (
    build_quad_features,
    grid_sample,
    grid_sample_quad,
)


def test_quad_matches_grid_sample():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 9, 13, 6)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.3, 1.3, size=(2, 77, 2)).astype(np.float32))
    ref = grid_sample(feats, grid, "bilinear", "border", True)
    quad = build_quad_features(feats)
    assert quad.shape == (2, 9, 13, 24)
    out = grid_sample_quad(quad, grid, align_corners=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_quad_edges_exact():
    """Corner/edge coordinates hit the clamped values exactly."""
    feats = jnp.asarray(
        np.arange(2 * 3 * 4 * 1, dtype=np.float32).reshape(2, 3, 4, 1)
    )
    grid = jnp.asarray(
        np.array([[[-1, -1], [1, 1], [1, -1], [-1, 1], [0, 0]]] * 2, np.float32)
    )
    ref = grid_sample(feats, grid, "bilinear", "border", True)
    out = grid_sample_quad(build_quad_features(feats), grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_model_quad_path_matches():
    import os

    from pixelnerf_tpu.config import load_config
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.utils import geometry

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = load_config(os.path.join(repo, "conf", "exp", "sn64.conf"))
    conf["model"]["mlp_coarse"]["d_hidden"] = 32
    conf["model"]["mlp_fine"] = {"type": "empty"}
    conf["model"]["encoder"]["num_layers"] = 2

    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 1, 16, 16, 3)).astype(np.float32))
    poses = jnp.asarray(
        geometry.look_at(np.array([0, 0, 2.0], np.float32), np.zeros(3))[None, None]
    )
    focal = jnp.asarray(np.float32(20.0))
    xyz = jnp.asarray(rng.normal(size=(1, 33, 3)).astype(np.float32) * 0.3)
    vd = jnp.ones((1, 33, 3)) / np.sqrt(3)

    outs = {}
    for quad in (False, True):
        conf["model"]["quad_gather"] = quad
        net = make_model(conf["model"])
        variables = net.init(jax.random.PRNGKey(0), images, poses, focal, xyz, vd)
        enc = net.apply(variables, images, poses, focal, method=net.encode)
        assert (enc.latent_quad is not None) == quad
        outs[quad] = np.asarray(
            net.apply(variables, enc, xyz, viewdirs=vd, method=net.query)
        )
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-5)
