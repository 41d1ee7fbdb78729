"""Attribute the Trainer-loop overhead over the compiled step.

Replicates bench.py's loop-ratio measurement but keeps the trainer's
PIXELNERF_TIME_LOOP instrumentation visible, so the per-batch wall time
splits into data-wait / dispatch / sync. Run on the real chip:

    python scripts/bench_train_loop.py
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PIXELNERF_NO_TB", "1")
os.environ["PIXELNERF_TIME_LOOP"] = "1"

import contextlib
import io
import tempfile

import numpy as np


def main():
    import jax

    from pixelnerf_tpu.config import load_config
    from pixelnerf_tpu.data.pipeline import RayBatchPipeline
    from pixelnerf_tpu.data.synthetic import SyntheticSphereDataset
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.render.renderer import RenderConfig
    from pixelnerf_tpu.train.trainer import Trainer
    from pixelnerf_tpu.utils import geometry  # noqa: F401

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = load_config(os.path.join(root, "conf", "exp", "srn.conf"))
    conf["train"]["save_interval"] = 10 ** 9
    conf["train"]["vis_interval"] = 10 ** 9
    conf["train"]["eval_interval"] = 10 ** 9
    net = make_model(conf["model"])
    cfg = RenderConfig(n_coarse=64, n_fine=32, n_fine_depth=16, white_bkgd=True)

    SB, H, W = 4, 128, 128
    dset = SyntheticSphereDataset(num_objects=8, num_views=8, image_size=(H, W))
    pipe = RayBatchPipeline(dset, batch_size=SB, rays_per_object=128,
                            views=(1,), workers=4)

    rng = np.random.default_rng(0)
    d0 = dset[0]
    import jax.numpy as jnp

    variables = net.init(
        jax.random.PRNGKey(0),
        jnp.asarray(d0["images"][None, :1]), jnp.asarray(d0["poses"][None, :1]),
        jnp.asarray(d0["focal"]), jnp.zeros((1, 8, 3)), jnp.ones((1, 8, 3)),
    )

    n_loop = 40
    pull_times = []

    class TimingPipe:
        def __iter__(self):
            for batch in pipe:
                pull_times.append(time.perf_counter())
                yield batch

    buf = io.StringIO()
    with tempfile.TemporaryDirectory() as td:
        trainer = Trainer(
            net, variables, TimingPipe(), None, cfg, conf, name="bench",
            out_dir=td, num_epochs=1, epoch_batches=n_loop,
        )
        with contextlib.redirect_stdout(buf):
            trainer.start()

    rows = re.findall(
        r"\[time\] data (\S+)s dispatch (\S+)s sync (\S+)s", buf.getvalue()
    )
    rows = np.array(rows, np.float64)[3:]  # drop compile-affected head
    deltas = np.diff(np.asarray(pull_times))[3:]
    print(f"steps measured: {len(deltas)}")
    print(f"per-step wall (median): {np.median(deltas):.4f} s")
    print(
        f"  data-wait {np.median(rows[:, 0]):.4f} s"
        f" | dispatch {np.median(rows[:, 1]):.4f} s"
        f" | sync {np.median(rows[:, 2]):.4f} s"
    )
    print(
        f"  unattributed (wall - data - dispatch - sync):"
        f" {np.median(deltas) - np.median(rows.sum(axis=1)):.4f} s"
    )


if __name__ == "__main__":
    main()
