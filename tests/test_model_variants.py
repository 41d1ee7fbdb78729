"""Less-traveled model configurations: global encoder, custom backbone,
no-viewdirs, depth-only z feature, SPADE modulation, ImplicitNet field."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_tpu.config import load_config, parse_string
from pixelnerf_tpu.models import make_model
from pixelnerf_tpu.utils import geometry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_model(conf_model, SB=1, NS=2, H=16, W=16, B=9):
    net = make_model(conf_model)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (SB, NS, H, W, 3)).astype(np.float32))
    poses = jnp.asarray(
        np.stack(
            [
                np.stack(
                    [geometry.look_at(np.array([0.5 * v, 0.3, 2.0], np.float32),
                                      np.zeros(3)) for v in range(NS)]
                )
            ]
            * SB
        )
    )
    focal = jnp.asarray(np.float32(20.0))
    xyz = jnp.asarray(rng.normal(size=(SB, B, 3)).astype(np.float32) * 0.3)
    vd = jnp.ones((SB, B, 3)) / np.sqrt(3)
    variables = net.init(jax.random.PRNGKey(0), images, poses, focal, xyz, vd)
    enc = net.apply(variables, images, poses, focal, method=net.encode)
    out = net.apply(variables, enc, xyz, viewdirs=vd, method=net.query)
    return net, np.asarray(out)


def _base_conf():
    conf = load_config(os.path.join(REPO, "conf", "exp", "sn64.conf"))
    conf["model"]["mlp_coarse"]["d_hidden"] = 32
    conf["model"]["mlp_fine"] = {"type": "empty"}
    conf["model"]["encoder"]["num_layers"] = 2
    return conf["model"]


def test_global_encoder_path():
    m = _base_conf()
    m["use_global_encoder"] = True
    m["global_encoder"] = parse_string("backbone = resnet18\nlatent_size = 16\n")
    net, out = _run_model(m)
    assert net.d_latent == 128 + 16
    assert out.shape == (1, 9, 4)
    assert np.isfinite(out).all()


def test_custom_backbone():
    m = _base_conf()
    m["encoder"]["backbone"] = "custom"
    net, out = _run_model(m, H=32, W=32)
    assert net.encoder.latent_size == 128
    assert out.shape == (1, 9, 4)
    assert np.isfinite(out).all()


def test_no_viewdirs_depth_only():
    """use_xyz=False + use_viewdirs=False: depth-only z feature (the
    reference's original single-view configuration style)."""
    m = _base_conf()
    m["use_xyz"] = False
    m["use_viewdirs"] = False
    m["use_code_viewdirs"] = True
    net = make_model(m)
    # d_in: 1 -> posenc(1) = 1*12+1 = 13
    assert net.d_in == 13
    _, out = _run_model(m)
    assert out.shape == (1, 9, 4)


def test_spade_modulation():
    m = _base_conf()
    m["mlp_coarse"]["use_spade"] = True
    net, out = _run_model(m)
    assert out.shape == (1, 9, 4)
    assert np.isfinite(out).all()


def test_implicitnet_field():
    m = _base_conf()
    m["mlp_coarse"] = parse_string(
        "type = mlp\ndims = [64, 64, 64]\nskip_in = [2]\ncombine_layer = 2\n"
        "dim_excludes_skip = True\n"
    )
    net, out = _run_model(m)
    assert out.shape == (1, 9, 4)
    assert np.isfinite(out).all()


def test_bake_encoding_skips_implicitnet():
    """bake_encoding must no-op (not crash) on an ImplicitNet field: the
    guard keys on n_blocks, which ImplicitNet lacks (it *does* define
    combine_layer, which fooled the previous guard)."""
    from pixelnerf_tpu.models import bake_encoding

    m = _base_conf()
    m["mlp_coarse"] = parse_string(
        "type = mlp\ndims = [64, 64, 64]\nskip_in = [2]\ncombine_layer = 2\n"
        "dim_excludes_skip = True\n"
    )
    net = make_model(m)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 2, 16, 16, 3)).astype(np.float32))
    poses = jnp.asarray(
        np.stack(
            [geometry.look_at(np.array([0.5 * v, 0.3, 2.0], np.float32),
                              np.zeros(3)) for v in range(2)]
        )[None]
    )
    focal = jnp.asarray(np.float32(20.0))
    xyz = jnp.zeros((1, 9, 3))
    vd = jnp.ones((1, 9, 3)) / np.sqrt(3)
    variables = net.init(jax.random.PRNGKey(0), images, poses, focal, xyz, vd)
    enc = net.apply(variables, images, poses, focal, method=net.encode)
    baked = bake_encoding(net, variables, enc)
    assert baked.tz_coarse is None and baked.tz_fine is None


def test_resnet18_backbone():
    m = _base_conf()
    m["encoder"]["backbone"] = "resnet18"
    m["encoder"]["num_layers"] = 3
    net, out = _run_model(m)
    assert net.encoder.latent_size == 256
    assert out.shape == (1, 9, 4)
