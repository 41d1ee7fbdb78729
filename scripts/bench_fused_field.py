"""Time the fused gather+MLP kernel against its unfused alternatives.

Stages timed at the bench config's fine-pass scale (C=512, d_hidden=512,
5 blocks, combine@3, d_in=42):

  xla       : XLA 4-corner gather + XLA dense chain (the shipped default)
  pallas2   : Pallas packed gather kernel, then Pallas fused-MLP kernel
  fused     : ONE kernel, gather for tile i+1 interleaved between the MLP
              denses of tile i (ops/fused_field.py)

If the pipeline overlap works, `fused` should approach
max(gather, mlp) ~ 20 ms instead of their ~31 ms sum.

Run on hardware: python scripts/bench_fused_field.py [n_points]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pixelnerf_tpu.ops.fused_field import fused_gather_resnetfc_infer
from pixelnerf_tpu.ops.fused_mlp import fused_resnetfc_infer, pack_weights
from pixelnerf_tpu.ops.gather_pallas import (
    bilinear_pair_bases,
    gather_packed_lerp,
    pack_lr_table,
)
from pixelnerf_tpu.ops.grid_sample import grid_sample

H = W = 64
C = 512
D_HIDDEN = 512
D_IN = 42
N_BLOCKS = 5
COMBINE = 3


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - t0) / iters


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 4096 * 96
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(H, W, C)).astype(np.float32)
    feats_bf = jnp.asarray(feats, jnp.bfloat16)
    table = pack_lr_table(jnp.asarray(feats))
    ix = jnp.asarray(rng.uniform(0, W - 1, size=(P,)).astype(np.float32))
    iy = jnp.asarray(rng.uniform(0, H - 1, size=(P,)).astype(np.float32))
    base, wg = bilinear_pair_bases(ix, iy, H, W)
    x = jnp.asarray(rng.normal(size=(P, D_IN)).astype(np.float32))

    params = {
        "lin_in": {"kernel": rng.normal(size=(D_IN, D_HIDDEN)).astype(np.float32),
                   "bias": rng.normal(size=(D_HIDDEN,)).astype(np.float32)},
        "lin_out": {"kernel": rng.normal(size=(D_HIDDEN, 4)).astype(np.float32),
                    "bias": rng.normal(size=(4,)).astype(np.float32)},
    }
    for i in range(COMBINE):
        params[f"lin_z_{i}"] = {
            "kernel": rng.normal(size=(C, D_HIDDEN)).astype(np.float32) * 0.1,
            "bias": rng.normal(size=(D_HIDDEN,)).astype(np.float32) * 0.1,
        }
    for i in range(N_BLOCKS):
        params[f"block{i}"] = {
            "fc_0": {"kernel": rng.normal(size=(D_HIDDEN, D_HIDDEN)).astype(np.float32) * 0.1,
                     "bias": rng.normal(size=(D_HIDDEN,)).astype(np.float32) * 0.1},
            "fc_1": {"kernel": rng.normal(size=(D_HIDDEN, D_HIDDEN)).astype(np.float32) * 0.1,
                     "bias": rng.normal(size=(D_HIDDEN,)).astype(np.float32) * 0.1},
        }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    weights = pack_weights(params, N_BLOCKS, COMBINE, C, D_IN, D_HIDDEN)

    # --- XLA reference chain (gather + dense chain in one jit) ---
    grid_pts = jnp.stack(
        [ix / (W - 1) * 2 - 1, iy / (H - 1) * 2 - 1], axis=-1
    )[None]

    @jax.jit
    def xla_chain(feats_bf, grid_pts, x):
        bf16 = jnp.bfloat16
        z = grid_sample(feats_bf[None], grid_pts)[0].astype(bf16)
        xb = x.astype(bf16)

        def dense(a, w, b):
            y = jnp.dot(
                a, w.astype(bf16), preferred_element_type=jnp.float32
            ).astype(bf16)
            return y + b.astype(bf16)

        h = dense(xb, params["lin_in"]["kernel"], params["lin_in"]["bias"])
        tz = [
            dense(z, params[f"lin_z_{i}"]["kernel"], params[f"lin_z_{i}"]["bias"])
            for i in range(COMBINE)
        ]
        for b in range(N_BLOCKS):
            if b < COMBINE:
                h = h + tz[b]
            net = dense(jnp.maximum(h, 0), params[f"block{b}"]["fc_0"]["kernel"],
                        params[f"block{b}"]["fc_0"]["bias"])
            dx = dense(jnp.maximum(net, 0), params[f"block{b}"]["fc_1"]["kernel"],
                       params[f"block{b}"]["fc_1"]["bias"])
            h = h + dx
        return dense(jnp.maximum(h, 0), params["lin_out"]["kernel"],
                     params["lin_out"]["bias"]).astype(jnp.float32)

    @jax.jit
    def pallas2(table, base, wg, x):
        z = gather_packed_lerp(table, base, wg)
        return fused_resnetfc_infer(z, x, weights, N_BLOCKS, COMBINE)

    @jax.jit
    def fused(table, base, wg, x):
        return fused_gather_resnetfc_infer(
            table, base, wg, x, weights, N_BLOCKS, COMBINE
        )

    t_xla = timeit(xla_chain, feats_bf, grid_pts, x) * 1e3
    t_p2 = timeit(pallas2, table, base, wg, x) * 1e3
    t_f = timeit(fused, table, base, wg, x) * 1e3
    print(f"P={P}")
    print(f"xla gather+mlp   : {t_xla:7.2f} ms")
    print(f"pallas 2 kernels : {t_p2:7.2f} ms")
    print(f"fused pipelined  : {t_f:7.2f} ms")

    # numerics: fused vs the 2-kernel composition must agree exactly
    a = np.asarray(fused(table, base, wg, x))
    b = np.asarray(pallas2(table, base, wg, x))
    print("fused == pallas2:", bool(np.array_equal(a, b)),
          "| max|delta| vs xla:", float(np.abs(a - np.asarray(
              xla_chain(feats_bf, grid_pts, x))[:, :4]).max()))


if __name__ == "__main__":
    main()
