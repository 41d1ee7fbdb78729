"""Training-step roofline (VERDICT r3 #2): remat-policy sweep + backward
stage attribution at the chip-filling config, mixed precision.

Measures, on the real chip:
  1. full train step (grad + Adam) under remat in {True, "features", False}
     — "features" saves the checkpoint-named gathered pixel-aligned
     features so the backward recomputes only MLP GEMMs (render/renderer.py)
  2. stage attribution at the best policy: forward-only loss, full grad,
     grad with stop_gradient on the encoding (kills encoder backward +
     the scatter-add gather transpose), grad with stop_gradient on the
     gathered features (MLP-only backward)

Prints one JSON line for PERF.md / bench cross-checks.

    python scripts/probe_train_roofline.py [--r 2048] [--chunk 256]

Reference hot path being rooflined: train/train.py:117-218 (the reference
never measured its own utilization; this probe is the TPU equivalent).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--r", type=int, default=2048)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from jax.ad_checkpoint import checkpoint_name

    from pixelnerf_tpu.config import ConfigNode, load_config
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.render.renderer import RenderConfig, render_rays_chunked
    from pixelnerf_tpu.train import (
        TrainState, make_render_loss, make_train_step,
    )
    from pixelnerf_tpu.utils import geometry

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = load_config(os.path.join(root, "conf", "exp", "srn.conf"))
    conf["model"]["dtype"] = args.dtype
    net = make_model(conf["model"])
    cfg = RenderConfig(n_coarse=64, n_fine=32, n_fine_depth=16,
                       white_bkgd=True)
    loss_fn = make_render_loss(conf.get_config("loss", ConfigNode()))
    optimizer = optax.adam(1e-4)

    SB, NS, H, W = 4, 1, 128, 128
    R, chunk = args.r, args.chunk
    rng = np.random.default_rng(0)
    pose = geometry.look_at(np.array([0.0, 0.1, 1.3], np.float32),
                            np.zeros(3))
    images = jnp.asarray(
        rng.uniform(-1, 1, (SB, NS, H, W, 3)).astype(np.float32))
    poses = jnp.asarray(np.broadcast_to(pose, (SB, NS, 4, 4)).copy())
    focal = jnp.asarray(np.float32(131.25))
    variables = net.init(
        jax.random.PRNGKey(0), images, poses, focal,
        jnp.zeros((SB, 8, 3)), jnp.ones((SB, 8, 3)),
    )
    cam_rays = np.asarray(
        geometry.gen_rays(poses[:, 0], W, H, focal, 0.8, 1.8)
    ).reshape(SB, -1, 8)
    rays = jnp.asarray(
        np.tile(cam_rays, (1, max(1, R // cam_rays.shape[1]), 1))[:, :R])
    rgb_gt = jnp.asarray(rng.uniform(0, 1, (SB, R, 3)).astype(np.float32))
    batch = {
        "images": images, "poses": poses,
        "focal": jnp.full((SB,), 131.25, jnp.float32),
        "c": jnp.full((SB, 2), 64.0, jnp.float32),
        "rays": rays, "rgb_gt": rgb_gt,
    }
    result = {"config": {"SB": SB, "R": R, "chunk": chunk,
                         "dtype": args.dtype,
                         "samples": "64+32 hierarchical"}}

    # --- 1. remat sweep over the FULL train step ----------------------------
    def time_step(remat):
        step = make_train_step(net, cfg, optimizer, loss_fn, mesh=None,
                               ray_chunk=chunk, remat=remat)
        state = TrainState(
            params=jax.tree_util.tree_map(jnp.array, variables["params"]),
            batch_stats=jax.tree_util.tree_map(
                jnp.array, variables.get("batch_stats", {})),
            opt_state=optimizer.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        state, metrics = step(state, dict(batch), jax.random.PRNGKey(0))
        jax.device_get(metrics["t"])  # compile barrier
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, metrics = step(
                state, dict(batch), jax.random.fold_in(jax.random.PRNGKey(1), i))
        jax.device_get(metrics["t"])
        dt = (time.perf_counter() - t0) / args.iters
        return dt

    sweep = {}
    for remat in (True, "features", False):
        label = {True: "full", False: "none"}.get(remat, remat)
        try:
            dt = time_step(remat)
            sweep[label] = {"ms_per_step": round(dt * 1e3, 1),
                            "rays_per_sec": round(SB * R / dt, 1)}
            print(f"remat={label:>8}: {dt*1e3:7.1f} ms/step "
                  f"({SB*R/dt/1e3:6.1f}k rays/s)", flush=True)
        except Exception as e:  # OOM at big R is an expected outcome
            sweep[label] = {"error": type(e).__name__}
            print(f"remat={label:>8}: {type(e).__name__}", flush=True)
    result["remat_sweep"] = sweep

    # --- 2. backward attribution (grad only, no optimizer) ------------------
    best = min((k for k in sweep if "ms_per_step" in sweep[k]),
               key=lambda k: sweep[k]["ms_per_step"])
    result["best_remat"] = best
    best_mode = {"full": True, "none": False}.get(best, best)

    def forward(params, stop_enc=False, stop_feats=False):
        # the STAGED query — identical structure to make_train_step's
        # loss_and_updates (train/step.py): the fine pass reuses the coarse
        # samples' gathered features, so attribution here decomposes the
        # actual compiled step, not a stand-in
        vs = {**variables, "params": params}
        enc = net.apply(vs, images, poses, focal, method=net.encode)
        if stop_enc:
            enc = jax.tree_util.tree_map(jax.lax.stop_gradient, enc)

        def features_fn(xyz, viewdirs):
            feats = net.apply(vs, enc, xyz, viewdirs=viewdirs,
                              method=net.query_features)
            if stop_feats:
                feats = jax.lax.stop_gradient(feats)
            # same tag as train/step.py — without it the "features" remat
            # policy's save_only_these_names matches nothing and the
            # attribution silently measures full remat instead
            return jax.tree_util.tree_map(
                lambda x: checkpoint_name(x, "gathered_features"), feats
            )

        def mlp_fn(feats, coarse):
            return net.apply(vs, enc, feats, coarse=coarse,
                             method=net.query_mlp)

        out = render_rays_chunked(
            (features_fn, mlp_fn), rays, jax.random.PRNGKey(0), cfg,
            ray_chunk=chunk, train=True, use_viewdirs=True, remat=best_mode,
        )
        loss, _ = loss_fn(out, rgb_gt)
        return loss

    def timeit(fn, label, iters=args.iters):
        f = jax.jit(fn)
        out = f(variables["params"])
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(variables["params"])
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:>28}: {dt*1e3:7.1f} ms", flush=True)
        return round(dt * 1e3, 1)

    def encode_only(params):
        vs = {**variables, "params": params}
        enc = net.apply(vs, images, poses, focal, method=net.encode)
        return jnp.sum(enc.latent) if hasattr(enc, "latent") else (
            sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(enc)))

    attr = {
        "encode_fwd_ms": timeit(encode_only, "encode only"),
        "forward_ms": timeit(lambda p: forward(p), "forward loss"),
        "grad_full_ms": timeit(lambda p: jax.grad(forward)(p), "grad full"),
        "grad_stop_encoding_ms": timeit(
            lambda p: jax.grad(lambda q: forward(q, stop_enc=True))(p),
            "grad stop-encoding"),
        "grad_mlp_only_ms": timeit(
            lambda p: jax.grad(lambda q: forward(q, stop_feats=True))(p),
            "grad stop-features (MLP only)"),
    }
    attr["full_step_ms"] = sweep[best]["ms_per_step"]
    attr["opt_and_gnorm_ms"] = round(
        sweep[best]["ms_per_step"] - attr["grad_full_ms"], 1)
    result["attribution"] = attr

    # --- roofline numbers ----------------------------------------------------
    from bench import V5E_BF16_PEAK, model_flops_per_ray
    f_ray = model_flops_per_ray(net, cfg, NS)
    best_dt = sweep[best]["ms_per_step"] / 1e3
    result["roofline"] = {
        "flops_per_ray_fwd": f_ray,
        # useful train FLOPs = fwd + 2x bwd GEMMs = 3x fwd (field only)
        "train_mfu": round(3 * SB * R * f_ray / best_dt / V5E_BF16_PEAK, 3),
        # actually-executed FLOPs incl. remat recompute of the MLP fwd
        "executed_mfu_full_remat": round(
            4 * SB * R * f_ray / best_dt / V5E_BF16_PEAK, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
