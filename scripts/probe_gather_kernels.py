"""Probe which Pallas gather formulations this Mosaic toolchain compiles.

Tries several in-kernel dynamic-row-gather strategies on small shapes and
reports compile success + correctness vs numpy. Run on the TPU.
"""
import functools
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 256, 512
TILE = 128
N = 512


def run(name, kernel, table_dt, idx_space):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32)).astype(table_dt)
    idx = jnp.asarray(rng.integers(0, R, (N, 4)).astype(np.int32))
    w = jnp.asarray(rng.uniform(0, 1, (N, 4)).astype(np.float32))
    ref = np.einsum(
        "nk,nkc->nc", np.asarray(w), np.asarray(table, np.float32)[np.asarray(idx)]
    )
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
            grid=(N // TILE,),
            in_specs=[
                pl.BlockSpec((TILE, 4), lambda i: (i, 0), memory_space=idx_space),
                pl.BlockSpec((TILE, 4), lambda i: (i, 0), memory_space=idx_space),
                pl.BlockSpec((R, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        )(idx, w, table)
        err = float(np.max(np.abs(np.asarray(out) - ref)))
        tol = 0.02 if table_dt == jnp.bfloat16 else 1e-4
        status = "OK " if err < tol else "WRONG"
        print(f"{name}: {status} max|err|={err:.5f}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


def k_loop_ds(idx_ref, w_ref, table_ref, out_ref):
    def body(j, _):
        acc = w_ref[j, 0] * table_ref[pl.ds(idx_ref[j, 0], 1), :]
        acc += w_ref[j, 1] * table_ref[pl.ds(idx_ref[j, 1], 1), :]
        acc += w_ref[j, 2] * table_ref[pl.ds(idx_ref[j, 2], 1), :]
        acc += w_ref[j, 3] * table_ref[pl.ds(idx_ref[j, 3], 1), :]
        out_ref[pl.ds(j, 1), :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, TILE, body, 0)


def k_take(idx_ref, w_ref, table_ref, out_ref):
    table = table_ref[:]
    acc = None
    for k in range(4):
        rows = jnp.take(table, idx_ref[:, k], axis=0)      # (TILE, C)
        term = w_ref[:, k : k + 1].astype(jnp.float32) * rows.astype(jnp.float32)
        acc = term if acc is None else acc + term
    out_ref[:] = acc.astype(out_ref.dtype)


def k_adv_index(idx_ref, w_ref, table_ref, out_ref):
    table = table_ref[:]
    acc = None
    for k in range(4):
        rows = table[idx_ref[:, k]]                         # (TILE, C)
        term = w_ref[:, k : k + 1].astype(jnp.float32) * rows.astype(jnp.float32)
        acc = term if acc is None else acc + term
    out_ref[:] = acc.astype(out_ref.dtype)


def make_block_mask_kernel(n_chan: int, tile: int):
    """Aligned 8-row block load + sublane one-hot reduce (shared with
    scripts/bench_gather_pallas.py, which times it at full scale)."""

    def k_block_mask(idx_ref, w_ref, table_ref, out_ref):
        def body(j, _):
            acc = jnp.zeros((1, n_chan), jnp.float32)
            for k in range(4):
                i = idx_ref[j, k]
                q = (i // 8) * 8
                r = i - q
                block = table_ref[pl.ds(q, 8), :].astype(jnp.float32)  # (8, C)
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == r
                ).astype(jnp.float32)
                acc += w_ref[j, k] * jnp.sum(block * sel, axis=0, keepdims=True)
            out_ref[pl.ds(j, 1), :] = acc.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, tile, body, 0)

    return k_block_mask


k_block_mask = make_block_mask_kernel(C, TILE)


def main():
    for dt, dtn in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for space, sn in ((pltpu.SMEM, "smem"), (pltpu.VMEM, "vmem")):
            run(f"loop_ds   {dtn} idx={sn}", k_loop_ds, dt, space)
        run(f"take      {dtn} idx=vmem", k_take, dt, pltpu.VMEM)
        run(f"adv_index {dtn} idx=vmem", k_adv_index, dt, pltpu.VMEM)
        run(f"block_mask {dtn} idx=smem", k_block_mask, dt, pltpu.SMEM)


if __name__ == "__main__":
    main()
