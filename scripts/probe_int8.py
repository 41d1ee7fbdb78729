#!/usr/bin/env python
"""Probe: do int8 dots actually run ~2x bf16 on this chip through XLA?

v5e datasheet: 197 TFLOP/s bf16 vs 394 TOP/s int8. If XLA reaches int8 MXU
throughput at the conditioned-MLP's shapes, a quantized inference path is
worth building (the MLP is ~55% of render chunk time); if not, record the
negative result in PERF.md and move on.

Shapes: one scan chunk of the renderer = 256 rays x 160 samples = 40960
points through 512-wide GEMMs (ResnetFC d_hidden, models/resnetfc.py).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    jax.device_get(jnp.sum(x))


def bench(fn, args, iters=50):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    M, K, N = 40960, 512, 512
    rng = np.random.default_rng(0)
    a_bf = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    b_bf = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    a_i8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    b_i8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)

    dot_bf = jax.jit(lambda a, b: a @ b)
    dot_i8 = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
    )
    # chained variant: 5 back-to-back GEMMs approximates the MLP block stack
    def chain_bf(a, b):
        x = a
        for _ in range(5):
            x = (x @ b).astype(jnp.bfloat16)
        return x

    def chain_i8(a, b):
        x = a
        for _ in range(5):
            y = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # requantize: shift down and saturate (the cheap dynamic-range
            # stand-in for per-tensor scales)
            x = jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
        return x

    flops = 2 * M * K * N
    for name, fn, args, reps in [
        ("bf16 single", dot_bf, (a_bf, b_bf), 1),
        ("int8 single", dot_i8, (a_i8, b_i8), 1),
        ("bf16 chain5", jax.jit(chain_bf), (a_bf, b_bf), 5),
        ("int8 chain5+requant", jax.jit(chain_i8), (a_i8, b_i8), 5),
    ]:
        dt = bench(fn, args)
        print(
            f"{name:22s} {dt * 1e3:7.3f} ms  "
            f"{reps * flops / dt / 1e12:7.1f} Tops/s"
        )


if __name__ == "__main__":
    main()
