"""Sweep the train-step scan chunk at chip-filling ray counts.

The render path's round-3 finding (256-ray scan microbatches keep the
inter-GEMM working set VMEM-resident; PERF.md) should apply to the
training forward+backward too — this measures it. Run on the real chip:

    python scripts/probe_train_chunk.py
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
    net = make_model(conf["model"])
    cfg = RenderConfig(n_coarse=64, n_fine=32, n_fine_depth=16, white_bkgd=True)
    loss_fn = make_render_loss(conf.get_config("loss", ConfigNode()))
    optimizer = optax.adam(1e-4)

    SB, NS, H, W = 4, 1, 128, 128
    rng = np.random.default_rng(0)
    pose = geometry.look_at(np.array([0.0, 0.1, 1.3], np.float32), np.zeros(3))
    images = rng.uniform(-1, 1, (SB, NS, H, W, 3)).astype(np.float32)
    poses = np.broadcast_to(pose, (SB, NS, 4, 4)).copy()
    variables = net.init(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(poses),
        jnp.asarray(np.float32(131.25)),
        jnp.zeros((SB, 8, 3)), jnp.ones((SB, 8, 3)),
    )
    cam_rays = np.asarray(
        geometry.gen_rays(jnp.asarray(poses[:, 0]), W, H,
                          jnp.asarray(np.float32(131.25)), 0.8, 1.8)
    ).reshape(SB, -1, 8)

    def bench(R, ray_chunk, iters=8):
        step = make_train_step(
            net, cfg, optimizer, loss_fn, mesh=None, ray_chunk=ray_chunk
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
        t_c0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        jax.device_get(metrics["t"])
        t_compile = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = step(
                state, batch, jax.random.fold_in(jax.random.PRNGKey(1), i)
            )
        jax.device_get(metrics["t"])
        dt = (time.perf_counter() - t0) / iters
        rps = SB * R / dt
        print(
            f"R={R:5d} chunk={str(ray_chunk):>5}: {dt*1e3:7.1f} ms/step"
            f"  {rps/1e3:7.1f}k rays/s  (compile {t_compile:.0f}s)",
            flush=True,
        )

    for R, chunk in [
        (2048, 1024), (2048, 256), (2048, None),
        (8192, 256), (8192, 512),
    ]:
        bench(R, chunk)


if __name__ == "__main__":
    main()
