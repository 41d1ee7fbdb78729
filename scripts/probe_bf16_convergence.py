"""Does bf16-compute (f32-param) training converge like f32?

Overfits one synthetic scene for N steps with both compute dtypes from
identical f32 init and data, and prints the loss trajectory + final PSNR.
Run on the real chip:

    python scripts/probe_bf16_convergence.py [steps]
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
    from pixelnerf_tpu.data.synthetic import SyntheticSphereDataset

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = load_config(os.path.join(root, "conf", "exp", "srn.conf"))
    net32 = make_model(conf["model"])
    conf["model"]["dtype"] = "bfloat16"
    net16 = make_model(conf["model"])
    cfg = RenderConfig(n_coarse=64, n_fine=32, n_fine_depth=16, white_bkgd=True)
    loss_fn = make_render_loss(conf.get_config("loss", ConfigNode()))
    # reference lr (train/train.py): higher rates kill the relu density
    # head on this mostly-empty synthetic scene within ~40 steps
    optimizer = optax.adam(1e-4)

    from pixelnerf_tpu.data import RayBatchPipeline

    SB, R = 4, 512
    dset = SyntheticSphereDataset(num_objects=SB, num_views=6,
                                  image_size=(64, 64))
    # bbox-biased ray sampling, like real training — uniform-random rays on
    # a mostly-white scene let the density head die (relu sigma -> all
    # white -> zero grad) in the first few steps
    pipe = RayBatchPipeline(
        dset, batch_size=SB, rays_per_object=R, views=(1,), seed=0, prefetch=0,
    )
    it = iter(pipe)
    batches = [
        {k: np.asarray(v) for k, v in next(it).items() if k != "step"}
        for _ in range(20)
    ]
    b0 = batches[0]

    variables = net32.init(
        jax.random.PRNGKey(0), jnp.asarray(b0["images"]),
        jnp.asarray(b0["poses"]), jnp.asarray(b0["focal"]),
        jnp.zeros((SB, 8, 3)), jnp.ones((SB, 8, 3)),
    )

    for label, net in [("f32 ", net32), ("bf16", net16)]:
        step = make_train_step(net, cfg, optimizer, loss_fn, ray_chunk=256)
        get_batch = lambda i: {k: jnp.asarray(v)
                               for k, v in batches[i % len(batches)].items()}
        state = TrainState(
            params=jax.tree_util.tree_map(jnp.array, variables["params"]),
            batch_stats=jax.tree_util.tree_map(
                jnp.array, variables.get("batch_stats", {})
            ),
            opt_state=optimizer.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        t0 = time.perf_counter()
        traj = []
        for i in range(n_steps):
            state, metrics = step(state, get_batch(i), np.int32(i))
            if i == 0 or (i + 1) % max(1, n_steps // 5) == 0:
                traj.append(
                    (float(metrics["t"]), float(metrics["gnorm"]))
                )
        mse = traj[-1][0] / 2.0  # lambda_coarse + lambda_fine
        psnr = -10.0 * np.log10(mse)
        print(f"{label}: loss {' '.join(f'{v:.4f}/{g:.3g}' for v, g in traj)}"
              f"  ~PSNR {psnr:5.2f} dB  ({time.perf_counter()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
