"""Fused gather+MLP kernel vs the composition of its two verified parts.

The fused kernel (ops/fused_field.py) must produce exactly what running the
packed-table Pallas gather (ops/gather_pallas.gather_packed_lerp) followed
by the fused MLP kernel (ops/fused_mlp.fused_resnetfc_infer) produces —
the pipeline overlap is a scheduling change, not a numerics change. Both
sides run in interpret mode (CPU) here; hardware parity is exercised by
scripts/bench_fused_field.py and the bench path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_tpu.ops.fused_field import fused_gather_resnetfc_infer
from pixelnerf_tpu.ops.fused_mlp import fused_resnetfc_infer, pack_weights
from pixelnerf_tpu.ops.gather_pallas import (
    bilinear_pair_bases,
    gather_packed_lerp,
    pack_lr_table,
)

D_HIDDEN = 64
D_LATENT = 128
D_IN = 42
N_BLOCKS = 5
COMBINE = 3


def _mlp_params(rng):
    p = {
        "lin_in": {
            "kernel": rng.normal(size=(D_IN, D_HIDDEN)).astype(np.float32),
            "bias": rng.normal(size=(D_HIDDEN,)).astype(np.float32),
        },
        "lin_out": {
            "kernel": rng.normal(size=(D_HIDDEN, 4)).astype(np.float32),
            "bias": rng.normal(size=(4,)).astype(np.float32),
        },
    }
    for i in range(COMBINE):
        p[f"lin_z_{i}"] = {
            "kernel": rng.normal(size=(D_LATENT, D_HIDDEN)).astype(np.float32) * 0.1,
            "bias": rng.normal(size=(D_HIDDEN,)).astype(np.float32) * 0.1,
        }
    for i in range(N_BLOCKS):
        p[f"block{i}"] = {
            "fc_0": {
                "kernel": rng.normal(size=(D_HIDDEN, D_HIDDEN)).astype(np.float32) * 0.1,
                "bias": rng.normal(size=(D_HIDDEN,)).astype(np.float32) * 0.1,
            },
            "fc_1": {
                "kernel": rng.normal(size=(D_HIDDEN, D_HIDDEN)).astype(np.float32) * 0.1,
                "bias": rng.normal(size=(D_HIDDEN,)).astype(np.float32) * 0.1,
            },
        }
    return p


@pytest.mark.parametrize("n_points", [64, 256, 700])
def test_fused_field_matches_composition(n_points):
    rng = np.random.default_rng(3)
    H = W = 9
    feats = rng.normal(size=(H, W, D_LATENT)).astype(np.float32)
    table = pack_lr_table(jnp.asarray(feats))

    ix = jnp.asarray(rng.uniform(0, W - 1, size=(n_points,)).astype(np.float32))
    iy = jnp.asarray(rng.uniform(0, H - 1, size=(n_points,)).astype(np.float32))
    base, wg = bilinear_pair_bases(ix, iy, H, W)
    x = jnp.asarray(rng.normal(size=(n_points, D_IN)).astype(np.float32))

    weights = pack_weights(
        jax.tree_util.tree_map(jnp.asarray, _mlp_params(rng)),
        N_BLOCKS, COMBINE, D_LATENT, D_IN, D_HIDDEN,
    )

    z = gather_packed_lerp(table, base, wg, interpret=True)
    want = fused_resnetfc_infer(
        z, x, weights, N_BLOCKS, COMBINE, interpret=True
    )
    got = fused_gather_resnetfc_infer(
        table, base, wg, x, weights, N_BLOCKS, COMBINE, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_field_exact_corner_hits():
    """Integer-coordinate samples must return the exact table rows through
    the whole pipeline's gather stage (wx = wy = 0)."""
    rng = np.random.default_rng(0)
    H = W = 5
    feats = rng.normal(size=(H, W, D_LATENT)).astype(np.float32)
    table = pack_lr_table(jnp.asarray(feats))

    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    ix = jnp.asarray(xs.reshape(-1).astype(np.float32))
    iy = jnp.asarray(ys.reshape(-1).astype(np.float32))
    base, wg = bilinear_pair_bases(ix, iy, H, W)
    n = ix.shape[0]
    x = jnp.zeros((n, D_IN), jnp.float32)

    weights = pack_weights(
        jax.tree_util.tree_map(jnp.asarray, _mlp_params(rng)),
        N_BLOCKS, COMBINE, D_LATENT, D_IN, D_HIDDEN,
    )
    z_exact = jnp.asarray(feats.reshape(H * W, D_LATENT), jnp.bfloat16)
    want = fused_resnetfc_infer(
        z_exact, x, weights, N_BLOCKS, COMBINE, interpret=True
    )
    got = fused_gather_resnetfc_infer(
        table, base, wg, x, weights, N_BLOCKS, COMBINE, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_query_fused_matches_query(tmp_path):
    """Model-level wiring: query_fused (packed-table fused gather+MLP) vs
    the standard query with the fused-MLP fast path (isolates the gather
    formulation as the only difference — both quantize to bf16)."""
    import os as _os

    from pixelnerf_tpu.config import load_config
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.models.pixelnerf import pack_encoding
    from pixelnerf_tpu.utils import geometry

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    conf = load_config(_os.path.join(repo, "conf", "exp", "sn64.conf"))
    conf["model"]["dtype"] = "bfloat16"
    conf["model"]["encoder"]["num_layers"] = 2
    net = make_model(conf["model"])
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 1, 16, 16, 3)).astype(np.float32))
    poses = jnp.asarray(
        np.stack([geometry.look_at(np.array([0.3, 0.2, 2.0], np.float32),
                                   np.zeros(3))])[:, None]
    )
    focal = jnp.asarray(np.float32(20.0))
    xyz = jnp.asarray(rng.uniform(-0.6, 0.6, (1, 333, 3)).astype(np.float32))
    vdirs = jnp.asarray(rng.normal(size=(1, 333, 3)).astype(np.float32))
    vdirs = vdirs / jnp.linalg.norm(vdirs, axis=-1, keepdims=True)
    variables = net.init(jax.random.PRNGKey(0), images, poses, focal, xyz, vdirs)
    enc = net.apply(variables, images, poses, focal, method=net.encode)
    penc = pack_encoding(net, enc)
    for coarse in (True, False):
        want = net.apply(
            variables, enc, xyz, viewdirs=vdirs, coarse=coarse, fast=True,
            method=net.query,
        )
        got = net.apply(
            variables, penc, xyz, viewdirs=vdirs, coarse=coarse,
            method=net.query_fused,
        )
        assert got.shape == want.shape == (1, 333, 4)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-2, rtol=5e-2
        )
        frac_close = np.mean(np.abs(np.asarray(got) - np.asarray(want)) < 1e-2)
        assert frac_close > 0.95, frac_close
