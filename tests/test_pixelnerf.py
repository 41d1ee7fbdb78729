"""Full PixelNeRF query math vs independent referee (default_mv flags)."""
import jax
import jax.numpy as jnp
import numpy as np

from pixelnerf_tpu.config import load_config
from pixelnerf_tpu.models import make_model
from pixelnerf_tpu.models.pixelnerf import SceneEncoding
from pixelnerf_tpu.utils import geometry
from torch_ref import referee_query

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_model():
    conf = load_config(os.path.join(REPO, "conf", "exp", "sn64.conf"))
    # shrink the MLP for test speed; keep the full flag set
    conf["model"]["mlp_coarse"]["d_hidden"] = 64
    conf["model"]["mlp_fine"]["d_hidden"] = 64
    conf["model"]["encoder"]["num_layers"] = 2
    return make_model(conf["model"])


def _setup(SB=2, NS=2, H=32, W=32, B=11, seed=0):
    net = _tiny_model()
    rng = np.random.default_rng(seed)
    images = rng.uniform(-1, 1, (SB, NS, H, W, 3)).astype(np.float32)
    poses = np.stack(
        [
            np.stack(
                [
                    geometry.look_at(rng.normal(size=3) * 2 + np.array([0, 0, 2.5]),
                                     np.zeros(3))
                    for _ in range(NS)
                ]
            )
            for _ in range(SB)
        ]
    ).astype(np.float32)
    focal = np.float32(40.0)
    xyz = rng.normal(size=(SB, B, 3)).astype(np.float32) * 0.3
    viewdirs = rng.normal(size=(SB, B, 3)).astype(np.float32)
    viewdirs /= np.linalg.norm(viewdirs, axis=-1, keepdims=True)
    variables = net.init(
        jax.random.PRNGKey(seed), jnp.asarray(images), jnp.asarray(poses),
        jnp.asarray(focal), jnp.asarray(xyz), jnp.asarray(viewdirs),
    )
    return net, variables, images, poses, focal, xyz, viewdirs


def test_query_matches_referee():
    net, variables, images, poses, focal, xyz, viewdirs = _setup()
    enc = net.apply(
        variables, jnp.asarray(images), jnp.asarray(poses), jnp.asarray(focal),
        method=net.encode,
    )
    for coarse, name in [(True, "mlp_coarse"), (False, "mlp_fine")]:
        ours = np.asarray(
            net.apply(
                variables, enc, jnp.asarray(xyz), viewdirs=jnp.asarray(viewdirs),
                coarse=coarse, method=net.query,
            )
        )
        ref = referee_query(variables, enc, xyz, viewdirs, name)
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_encode_focal_and_poses():
    net, variables, images, poses, focal, xyz, viewdirs = _setup(SB=1, NS=1)
    enc = net.apply(
        variables, jnp.asarray(images), jnp.asarray(poses), jnp.asarray(focal),
        method=net.encode,
    )
    # fy negated (reference models.py:130)
    np.testing.assert_allclose(np.asarray(enc.focal), [[40.0, -40.0]])
    # principal point defaults to image center
    np.testing.assert_allclose(np.asarray(enc.c), [[16.0, 16.0]])
    # stored pose is world->camera of the input camera-to-world
    w2c = np.asarray(geometry.invert_pose(poses.reshape(-1, 4, 4)))
    np.testing.assert_allclose(np.asarray(enc.poses), w2c, atol=1e-6)


def test_single_view_equals_duplicated_views():
    """Average-fusion over two identical source views == single view."""
    net, variables, images, poses, focal, xyz, viewdirs = _setup(SB=1, NS=2)
    images[:, 1] = images[:, 0]
    poses[:, 1] = poses[:, 0]
    enc2 = net.apply(
        variables, jnp.asarray(images), jnp.asarray(poses), jnp.asarray(focal),
        method=net.encode,
    )
    enc1 = net.apply(
        variables, jnp.asarray(images[:, :1]), jnp.asarray(poses[:, :1]),
        jnp.asarray(focal), method=net.encode,
    )
    out2 = net.apply(
        variables, enc2, jnp.asarray(xyz), viewdirs=jnp.asarray(viewdirs),
        method=net.query,
    )
    out1 = net.apply(
        variables, enc1, jnp.asarray(xyz), viewdirs=jnp.asarray(viewdirs),
        method=net.query,
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=1e-5)


def test_output_ranges():
    net, variables, images, poses, focal, xyz, viewdirs = _setup(SB=1, NS=1, B=64)
    enc = net.apply(
        variables, jnp.asarray(images), jnp.asarray(poses), jnp.asarray(focal),
        method=net.encode,
    )
    out = np.asarray(
        net.apply(
            variables, enc, jnp.asarray(xyz), viewdirs=jnp.asarray(viewdirs),
            method=net.query,
        )
    )
    assert out.shape == (1, 64, 4)
    assert out[..., :3].min() >= 0.0 and out[..., :3].max() <= 1.0
    assert out[..., 3].min() >= 0.0


def test_per_view_intrinsics():
    """encode accepts per-view (SB*NS, 2) focal/c; uniform per-view values
    match the broadcast (SB, 2) path exactly (reference models.py:119-141)."""
    net, variables, images, poses, focal, xyz, viewdirs = _setup()
    SB, NS = images.shape[:2]
    args = (jnp.asarray(images), jnp.asarray(poses))
    enc_scalar = net.apply(variables, *args, jnp.asarray(focal), method=net.encode)
    per_view = np.full((SB * NS, 2), focal, np.float32)
    enc_pv = net.apply(variables, *args, jnp.asarray(per_view), method=net.encode)
    q = lambda enc: np.asarray(
        net.apply(variables, enc, jnp.asarray(xyz), viewdirs=jnp.asarray(viewdirs),
                  coarse=True, method=net.query)
    )
    np.testing.assert_allclose(q(enc_scalar), q(enc_pv), rtol=1e-6, atol=1e-6)
    # distinct per-view focals must run (not hard-fail) and differ
    distinct = per_view * np.linspace(0.8, 1.2, SB * NS)[:, None].astype(np.float32)
    enc_d = net.apply(variables, *args, jnp.asarray(distinct), method=net.encode)
    assert not np.allclose(q(enc_d), q(enc_scalar))


def test_baked_encoding_matches_unbaked():
    """bake_encoding folds lin_z into the feature map; query must agree
    (exact modulo f32 reassociation) in single- and multi-view settings."""
    from pixelnerf_tpu.models import bake_encoding

    for NS in (1, 2):
        net, variables, images, poses, focal, xyz, viewdirs = _setup(NS=NS, seed=3)
        enc = net.apply(
            variables, jnp.asarray(images), jnp.asarray(poses), jnp.asarray(focal),
            method=net.encode,
        )
        baked = bake_encoding(net, variables, enc)
        assert baked.tz_coarse is not None and baked.tz_fine is not None
        n_lin_z = min(net.mlp_coarse.combine_layer, net.mlp_coarse.n_blocks)
        assert baked.tz_coarse.shape[-1] == n_lin_z * net.mlp_coarse.d_hidden
        for coarse in (True, False):
            plain = np.asarray(
                net.apply(
                    variables, enc, jnp.asarray(xyz),
                    viewdirs=jnp.asarray(viewdirs), coarse=coarse,
                    method=net.query,
                )
            )
            fast = np.asarray(
                net.apply(
                    variables, baked, jnp.asarray(xyz),
                    viewdirs=jnp.asarray(viewdirs), coarse=coarse,
                    method=net.query,
                )
            )
            np.testing.assert_allclose(fast, plain, atol=3e-5, rtol=1e-4)


def test_normalize_intrinsic_1d_precedence():
    """Documented 1-D shape precedence: (2,) at SB=1 is an (fx, fy) pair;
    any other 1-D input is per-entry scalars f_i -> (f_i, f_i) (reference
    models.py:119-141 documents the scalar-vector semantics)."""
    from pixelnerf_tpu.models.pixelnerf import _normalize_intrinsic

    # (fx, fy) pair at SB=1 (DTU-style adapters emit this)
    out = _normalize_intrinsic(jnp.array([100.0, 120.0]), 1, "focal", 3)
    np.testing.assert_allclose(np.asarray(out), [[100.0, 120.0]])

    # the same shape at SB=2 means two per-object scalars
    out = _normalize_intrinsic(jnp.array([100.0, 120.0]), 2, "focal", 1)
    np.testing.assert_allclose(
        np.asarray(out), [[100.0, 100.0], [120.0, 120.0]]
    )

    # per-view scalars (SB*NS,) pass through as (SB*NS, 2)
    out = _normalize_intrinsic(jnp.arange(4.0) + 1, 2, "focal", 2)
    assert out.shape == (4, 2)
    np.testing.assert_allclose(np.asarray(out)[:, 0], [1.0, 2.0, 3.0, 4.0])

    # scalar broadcast + rank-2 passthrough
    np.testing.assert_allclose(
        np.asarray(_normalize_intrinsic(7.0, 2, "focal")),
        np.full((2, 2), 7.0),
    )
