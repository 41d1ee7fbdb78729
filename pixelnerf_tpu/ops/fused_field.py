"""Fused pixel-aligned gather + conditioned MLP (Pallas, TPU).

The render hot loop has two dominant stages with disjoint hardware
bottlenecks: the bilinear feature gather (scalar-unit/VPU-bound — dynamic
row addressing is ~27 cycles/point regardless of load width or count, see
PERF.md) and the conditioned ResnetFC MLP (MXU-bound). Run separately they
serialize: ~11 ms gather + ~20 ms MLP per 4096-ray chunk. This kernel runs
both in ONE Pallas call with a software pipeline so they overlap:

- the LR-packed feature table (``gather_pallas.pack_lr_table``) and all MLP
  weights stay VMEM-pinned across grid steps;
- two VMEM scratch buffers double-buffer the gathered latents;
- grid step ``i`` issues the MLP's dense chain for tile ``i`` (MXU) with
  the gather loop for tile ``i+1`` interleaved *between* the dense ops.
  TPU cores issue in order but the MXU drains asynchronously, so the
  scalar/vector gather instructions execute while the matrix unit works
  through the previously-issued GEMM — the gather rides in the MXU's
  shadow instead of serializing with it.

Semantics: identical math to the XLA path — the gather is the
``_gather_packed_kernel`` lerp (bit-exact vs the bf16 XLA gather), the MLP
matches ``fused_mlp._mlp_kernel`` (f32 MXU accumulation rounded to bf16
before the bias add, like ``nn.Dense(dtype=bfloat16)``).

Single-view inference only (the multi-view combine-at-layer path and
training keep XLA). Reference hot ops: src/model/encoder.py:102-108
(grid_sample) + src/model/resnetfc.py:132 (MLP) called from
src/model/models.py:213,242.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather_pallas import _round_up, packed_bilerp

TILE = 256      # points per grid step; also the scratch roll granularity
LANE = 128


def _fused_kernel(
    base_ref, wg_ref, x_ref, table_ref,
    win_ref, bin_ref, wz_ref, bz_ref, w0_ref, b0_ref, w1_ref, b1_ref,
    wout_ref, bout_ref, out_ref, z2_ref,
    *, n_blocks: int, combine_layer: int, d_hidden: int, tile: int,
):
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    i = pl.program_id(0)
    # z2 is the (2*tile, C) latent double-buffer; the halves swap roles each
    # step (tile-multiple offsets keep Mosaic's alignment analysis happy).
    # base/wg carry BOTH this tile's and the next tile's values as column
    # pairs (wrapper rolls the arrays by `tile`): SMEM windows are padded to
    # 128 lanes x 2 buffers = 256 KB each regardless of their true width,
    # and four separate windows blew the 1 MB SMEM budget.
    cur = (i % 2) * tile
    nxt = tile - cur

    def gather_span(dst_off, col, lo, n):
        """Bilinear gather of points [lo, lo+n) from the packed table
        (2 dynamic row loads/point; lerp form of _gather_packed_kernel).
        ``col`` selects the column pair: 0 = this tile, 2 = next tile."""

        def body(j, _):
            t0 = table_ref[pl.ds(base_ref[j, col + 0], 1), :]
            t1 = table_ref[pl.ds(base_ref[j, col + 1], 1), :]
            row = packed_bilerp(t0, t1, wg_ref[j, col], wg_ref[j, col + 1])
            z2_ref[pl.ds(dst_off + j, 1), :] = row.astype(z2_ref.dtype)
            return 0

        jax.lax.fori_loop(lo, lo + n, body, 0)

    def dense(a, w, b):
        y = jnp.dot(a, w, preferred_element_type=f32).astype(bf16)
        return y + b

    n_lin_z = min(combine_layer, n_blocks)
    # one gather span per dense in the chain; the span issues right after
    # its dense so the scalar/VPU work overlaps the in-flight MXU op
    n_slots = 2 + 2 * n_blocks + 1
    span = -(-tile // n_slots)

    # prologue: tile 0's latents are gathered serially at step 0 (cur == 0)
    @pl.when(i == 0)
    def _():
        gather_span(0, 0, 0, tile)

    slot_state = [0]

    def g():
        lo = slot_state[0] * span
        slot_state[0] += 1
        n = min(span, tile - lo)
        if n > 0:
            gather_span(nxt, 2, lo, n)

    h = dense(x_ref[:], win_ref[:], bin_ref[:])
    g()
    if n_lin_z > 0:
        # scratch rows are f32 (Mosaic rejects dynamic sub-tile bf16
        # stores); the bf16 round happens here instead — same value
        tz = dense(
            z2_ref[pl.ds(cur, tile), :].astype(bf16), wz_ref[:], bz_ref[:]
        )
        g()
    for b in range(n_blocks):
        if b < combine_layer and n_lin_z > 0:
            h = h + tz[:, b * d_hidden : (b + 1) * d_hidden]
        net = dense(jnp.maximum(h, 0), w0_ref[b], b0_ref[b])
        g()
        dx = dense(jnp.maximum(net, 0), w1_ref[b], b1_ref[b])
        g()
        h = h + dx
    out = jnp.dot(
        jnp.maximum(h, 0), wout_ref[:], preferred_element_type=f32
    ).astype(bf16) + bout_ref[:]
    while slot_state[0] < n_slots:
        g()
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_blocks", "combine_layer", "interpret"),
)
def fused_gather_resnetfc_infer(
    table: jax.Array,
    base: jax.Array,
    wg: jax.Array,
    x: jax.Array,
    weights: Tuple[jax.Array, ...],
    n_blocks: int,
    combine_layer: int,
    interpret: bool = False,
) -> jax.Array:
    """Gather per-point latents and run the conditioned MLP in one kernel.

    :param table: (R, C) int32 LR-packed feature rows
        (:func:`gather_pallas.pack_lr_table`); must fit in VMEM
    :param base: (N, 2) int32 row bases (:func:`gather_pallas.bilinear_pair_bases`)
    :param wg: (N, 2) float32 [wx, wy] fractional lerp weights
    :param x: (N, d_in) z-features (posenc'd coords [+ viewdirs])
    :param weights: packed MLP weights from :func:`fused_mlp.pack_weights`
    :return: (N, 4) f32 raw rgb+sigma (pre-activation)
    """
    win, bin_, wz, bz, w0, b0, w1, b1, wout, bout = weights
    R, C = table.shape
    N = base.shape[0]
    d_hidden = w0.shape[-1]
    d_in_pad = win.shape[0]

    n_pad = _round_up(max(N, 1), TILE)
    if x.shape[-1] < d_in_pad:
        x = jnp.pad(x, ((0, 0), (0, d_in_pad - x.shape[-1])))
    if n_pad != N:
        base = jnp.pad(base, ((0, n_pad - N), (0, 0)))
        wg = jnp.pad(wg, ((0, n_pad - N), (0, 0)))
        x = jnp.pad(x, ((0, n_pad - N), (0, 0)))
    x = x.astype(jnp.bfloat16)
    # column pairs: [this tile | next tile] (see kernel SMEM-budget note);
    # the final tile's next-pair wraps around — gathered into the unused
    # scratch half, never read
    base = base.astype(jnp.int32)
    wg = wg.astype(jnp.float32)
    base2 = jnp.concatenate([base, jnp.roll(base, -TILE, axis=0)], axis=1)
    wg2 = jnp.concatenate([wg, jnp.roll(wg, -TILE, axis=0)], axis=1)

    grid_n = n_pad // TILE
    kernel = functools.partial(
        _fused_kernel,
        n_blocks=n_blocks,
        combine_layer=combine_layer,
        d_hidden=d_hidden,
        tile=TILE,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32),
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec((TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),               # base pairs
            pl.BlockSpec((TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),               # wg pairs
            pl.BlockSpec((TILE, d_in_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),               # x
            full(table.shape),
            full(win.shape), full(bin_.shape),
            full(wz.shape), full(bz.shape),
            full(w0.shape), full(b0.shape),
            full(w1.shape), full(b1.shape),
            full(wout.shape), full(bout.shape),
        ],
        out_specs=pl.BlockSpec(
            (TILE, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * TILE, C), jnp.float32),  # latent double-buffer
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d_hidden * (
                d_in_pad
                + min(combine_layer, n_blocks) * d_hidden
                + 2 * n_blocks * d_hidden
                + LANE
            ),
            bytes_accessed=(
                n_pad * (16 + d_in_pad * 2 + 2 * C * 4) + n_pad * LANE * 4
            ),
            transcendentals=0,
        ),
    )(
        base2, wg2,
        x, table, win, bin_, wz, bz, w0, b0, w1, b1, wout, bout,
    )
    return out[:N, :4]
