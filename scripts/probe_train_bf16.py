"""Mixed-precision train step: bf16 compute, f32 params/optimizer.

Measures the full train step built from a bfloat16-compute model while the
TrainState keeps f32 params (flax param_dtype default) — the standard TPU
mixed-precision recipe. Run on the real chip:

    python scripts/probe_train_bf16.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from pixelnerf_tpu.config import ConfigNode, load_config
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.render.renderer import RenderConfig
    from pixelnerf_tpu.train import TrainState, make_render_loss, make_train_step
    from pixelnerf_tpu.utils import geometry

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = load_config(os.path.join(root, "conf", "exp", "srn.conf"))
    net32 = make_model(conf["model"])
    conf["model"]["dtype"] = "bfloat16"
    net16 = make_model(conf["model"])
    cfg = RenderConfig(n_coarse=64, n_fine=32, n_fine_depth=16, white_bkgd=True)
    loss_fn = make_render_loss(conf.get_config("loss", ConfigNode()))
    optimizer = optax.adam(1e-4)

    SB, NS, H, W = 4, 1, 128, 128
    rng = np.random.default_rng(0)
    pose = geometry.look_at(np.array([0.0, 0.1, 1.3], np.float32), np.zeros(3))
    images = rng.uniform(-1, 1, (SB, NS, H, W, 3)).astype(np.float32)
    poses = np.broadcast_to(pose, (SB, NS, 4, 4)).copy()
    variables = net32.init(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(poses),
        jnp.asarray(np.float32(131.25)),
        jnp.zeros((SB, 8, 3)), jnp.ones((SB, 8, 3)),
    )
    leaves = jax.tree_util.tree_leaves(variables["params"])
    print("param dtypes:", {str(l.dtype) for l in leaves})
    cam_rays = np.asarray(
        geometry.gen_rays(jnp.asarray(poses[:, 0]), W, H,
                          jnp.asarray(np.float32(131.25)), 0.8, 1.8)
    ).reshape(SB, -1, 8)

    def bench(net, label, R, ray_chunk, remat=True, iters=8):
        step = make_train_step(
            net, cfg, optimizer, loss_fn, mesh=None, ray_chunk=ray_chunk,
            remat=remat,
        )
        state = TrainState(
            params=jax.tree_util.tree_map(jnp.array, variables["params"]),
            batch_stats=jax.tree_util.tree_map(
                jnp.array, variables.get("batch_stats", {})
            ),
            opt_state=optimizer.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        batch = {
            "images": jnp.asarray(images),
            "poses": jnp.asarray(poses),
            "focal": jnp.full((SB,), 131.25, jnp.float32),
            "c": jnp.full((SB, 2), 64.0, jnp.float32),
            "rays": jnp.asarray(
                np.tile(cam_rays, (1, max(1, R // cam_rays.shape[1]), 1))[:, :R]
            ),
            "rgb_gt": jnp.asarray(
                rng.uniform(0, 1, (SB, R, 3)).astype(np.float32)
            ),
        }
        try:
            t_c0 = time.perf_counter()
            state, metrics = step(state, batch, jax.random.PRNGKey(0))
            jax.device_get(metrics["t"])
            t_compile = time.perf_counter() - t_c0
        except Exception as e:
            print(f"{label:>28} R={R:5d} chunk={str(ray_chunk):>5}: "
                  f"FAILED {type(e).__name__}: {e}", flush=True)
            return
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = step(
                state, batch, jax.random.fold_in(jax.random.PRNGKey(1), i)
            )
        jax.device_get(metrics["t"])
        dt = (time.perf_counter() - t0) / iters
        g = jax.tree_util.tree_leaves(state.params)
        print(
            f"{label:>28} R={R:5d} chunk={str(ray_chunk):>5}:"
            f" {dt*1e3:7.1f} ms/step  {SB*R/dt/1e3:6.1f}k rays/s"
            f"  loss={float(metrics['t']):.4f}"
            f"  (params stay {g[0].dtype}, compile {t_compile:.0f}s)",
            flush=True,
        )

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=["b:2048:256", "b:8192:256"],
                    help="dtype:R:chunk triples, dtype in {b,f}")
    for spec in ap.parse_args().configs:
        parts = spec.split(":")
        d, R, chunk = parts[:3]
        remat = parts[3] if len(parts) > 3 else "full"
        remat = {"full": True, "dots": "dots", "none": False}[remat]
        net = net16 if d == "b" else net32
        label = f"bf16 remat={remat}" if d == "b" else f"f32 remat={remat}"
        bench(net, label, int(R), None if chunk == "none" else int(chunk),
              remat=remat)


if __name__ == "__main__":
    main()
