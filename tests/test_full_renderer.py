"""FullRenderer: chunk padding and batched-object rendering."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from pixelnerf_tpu.config import load_config
from pixelnerf_tpu.eval.common import FullRenderer
from pixelnerf_tpu.models import make_model
from pixelnerf_tpu.render import RenderConfig
from pixelnerf_tpu.utils import geometry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _setup(SB=2):
    conf = load_config(os.path.join(REPO, "conf", "exp", "sn64.conf"))
    conf["model"]["mlp_coarse"]["d_hidden"] = 32
    conf["model"]["mlp_fine"] = {"type": "empty"}
    conf["model"]["encoder"]["num_layers"] = 2
    net = make_model(conf["model"])
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (SB, 1, 16, 16, 3)).astype(np.float32))
    poses = jnp.asarray(
        np.stack(
            [geometry.look_at(np.array([0.2 * i, 0.1, 2.0], np.float32), np.zeros(3))
             for i in range(SB)]
        )[:, None]
    )
    focal = jnp.asarray(np.float32(20.0))
    variables = net.init(
        jax.random.PRNGKey(0), images, poses, focal,
        jnp.zeros((SB, 4, 3)), jnp.ones((SB, 4, 3)),
    )
    enc = net.apply(variables, images, poses, focal, method=net.encode)
    rays = np.asarray(
        geometry.gen_rays(poses[:, 0], 16, 16, focal, 1.0, 3.0)
    ).reshape(SB, -1, 8)
    return net, variables, enc, rays


def test_chunk_padding():
    """Ray counts not divisible by the chunk size are padded, rendered, and
    cropped back — output length always equals the input ray count."""
    net, variables, enc, rays = _setup(SB=1)
    cfg = RenderConfig(n_coarse=8)
    key = jax.random.PRNGKey(3)
    for chunk in (256, 100, 97):
        out = FullRenderer(net, cfg, ray_chunk=chunk)(variables, enc, rays[0], key)
        assert out["coarse"]["rgb"].shape == (256, 3)
        assert out["coarse"]["depth"].shape == (256,)
        assert np.isfinite(out["coarse"]["rgb"]).all()
        # expected depth = sum(w*z) can fall below near when sum(w) < 1
        d = out["coarse"]["depth"]
        assert d.min() >= 0.0 and d.max() <= 3.0 + 1e-5


def test_staged_renderer_with_baked_encoding_matches_unbaked():
    """A baked encoding holds *per-MLP* injection maps, so the staged
    renderer (which gathers features once and reuses them for the fine
    pass) must fall back to the unstaged path rather than feed the fine
    MLP the coarse MLP's baked injections. Rendering a baked encoding
    through the default (staged) FullRenderer must therefore agree with
    the unbaked render exactly."""
    from pixelnerf_tpu.models import bake_encoding

    conf = load_config(os.path.join(REPO, "conf", "exp", "sn64.conf"))
    conf["model"]["mlp_coarse"]["d_hidden"] = 32
    conf["model"]["mlp_fine"]["d_hidden"] = 32      # separate fine MLP
    conf["model"]["encoder"]["num_layers"] = 2
    net = make_model(conf["model"])
    assert net.mlp_fine is not None
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 1, 16, 16, 3)).astype(np.float32))
    poses = jnp.asarray(
        np.stack([geometry.look_at(np.array([0.2, 0.1, 2.0], np.float32),
                                   np.zeros(3))])[:, None]
    )
    focal = jnp.asarray(np.float32(20.0))
    variables = net.init(
        jax.random.PRNGKey(0), images, poses, focal,
        jnp.zeros((1, 4, 3)), jnp.ones((1, 4, 3)),
    )
    enc = net.apply(variables, images, poses, focal, method=net.encode)
    baked = bake_encoding(net, variables, enc)
    rays = np.asarray(
        geometry.gen_rays(poses[:, 0], 16, 16, focal, 1.0, 3.0)
    ).reshape(-1, 8)

    cfg = RenderConfig(n_coarse=8, n_fine=4)
    key = jax.random.PRNGKey(7)
    fr = FullRenderer(net, cfg, ray_chunk=256, staged=True)
    out_plain = fr(variables, enc, rays, key)
    out_baked = fr(variables, baked, rays, key)
    np.testing.assert_allclose(
        out_baked["fine"]["rgb"], out_plain["fine"]["rgb"], rtol=0, atol=2e-5
    )
    np.testing.assert_allclose(
        out_baked["coarse"]["rgb"], out_plain["coarse"]["rgb"], rtol=0, atol=2e-5
    )


def test_render_batch_shapes_and_sanity():
    """Batched-object rendering returns (SB, NR, ...) results with each
    object conditioned on its own encoding."""
    net, variables, enc, rays = _setup(SB=2)
    cfg = RenderConfig(n_coarse=8)
    fr = FullRenderer(net, cfg, ray_chunk=128, want_weights=True)
    out = fr.render_batch(variables, enc, rays, jax.random.PRNGKey(5))
    assert out["coarse"]["rgb"].shape == (2, 256, 3)
    assert out["coarse"]["weights"].shape == (2, 256, 8)
    assert np.isfinite(out["coarse"]["rgb"]).all()
    # the two objects are genuinely different scenes -> different renders
    assert np.abs(out["coarse"]["rgb"][0] - out["coarse"]["rgb"][1]).max() > 1e-4
