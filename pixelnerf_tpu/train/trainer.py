"""Generic training harness (reference train/trainlib/trainer.py lifecycle).

Epoch/batch loop with interval-driven side effects (print / eval / save /
vis), Adam with optional per-epoch exponential LR decay, crash-tolerant
checkpointing, TensorBoard scalars (gated on availability), and resume.
Overridable hooks mirror the reference: ``post_batch``, ``extra_save_state``,
``vis_step``.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ConfigNode
from ..render.renderer import RenderConfig
from .loss import make_render_loss
from .state import TrainState, load_checkpoint, save_checkpoint
from .step import make_eval_step, make_train_step


class Trainer:
    def __init__(
        self,
        net,
        variables,
        train_pipeline: Iterable,
        test_pipeline: Optional[Iterable],
        render_cfg: RenderConfig,
        conf,                       # 'train' + 'loss' config root
        name: str = "exp",
        out_dir: str = "results",
        lr: float = 1e-4,
        gamma: float = 1.0,
        mesh=None,
        num_epochs: int = 10000000,
        epoch_batches: int = 1000,
        train_encoder: bool = True,
        resume: bool = False,
        vis_fn: Optional[Callable] = None,
        render_schedule=None,
        train_ray_chunk=None,
        train_remat=True,
        seed: int = 0,
        ckpt_dir: Optional[str] = None,
        visual_dir: Optional[str] = None,
        log_dir: Optional[str] = None,
    ):
        self.net = net
        self.render_cfg = render_cfg
        self.name = name
        self.mesh = mesh
        self.num_epochs = num_epochs
        self.epoch_batches = epoch_batches
        self.vis_fn = vis_fn

        tconf = conf.get_config("train", None) or ConfigNode()
        get = tconf.get_int
        self.print_interval = get("print_interval", 2)
        self.save_interval = get("save_interval", 50)
        self.vis_interval = get("vis_interval", 100)
        self.eval_interval = get("eval_interval", 50)
        self.accu_grad = get("accu_grad", 1)
        self.num_epoch_repeats = get("num_epoch_repeats", 1)

        self.ckpt_dir = ckpt_dir or os.path.join(out_dir, "checkpoints", name)
        self.visual_dir = visual_dir or os.path.join(out_dir, "visuals", name)
        self._log_dir = log_dir or os.path.join(out_dir, "logs", name)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        os.makedirs(self.visual_dir, exist_ok=True)

        self.gamma = gamma
        # per-epoch ExponentialLR semantics (reference trainer.py:49-54):
        # staircase so the rate changes once per epoch, not continuously
        # an epoch is epoch_batches * num_epoch_repeats optimizer steps
        # (the reference steps ExponentialLR once per epoch incl. repeats)
        schedule = (
            optax.exponential_decay(
                lr,
                transition_steps=epoch_batches * self.num_epoch_repeats,
                decay_rate=gamma,
                staircase=True,
            )
            if gamma != 1.0
            else lr
        )
        optimizer = optax.adam(schedule)
        if self.accu_grad > 1:
            optimizer = optax.MultiSteps(optimizer, self.accu_grad)
        self.optimizer = optimizer

        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self.state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        if resume:
            restored = load_checkpoint(self.ckpt_dir, self.state)
            if restored is not None:
                self.state = restored
                # keep the sampling curriculum (no_bbox_step) aligned with
                # the restored optimizer step across restarts
                if hasattr(train_pipeline, "step"):
                    train_pipeline.step = int(restored.step)
                print(f"Resumed from step {int(self.state.step)}")
        # host-side mirror of state.step (which advances by 1 per call):
        # reading state.step inside the loop would block on the in-flight
        # device step every batch, serializing host data prep against device
        # compute (measured ~3x step-time inflation in round 1)
        self._host_step = int(self.state.step)

        loss_conf = conf.get_config("loss", None) or ConfigNode()
        self.loss_fn = make_render_loss(loss_conf)
        self.render_schedule = render_schedule
        self.train_encoder = train_encoder
        self.train_ray_chunk = train_ray_chunk
        self.train_remat = train_remat
        self._step_cache = {}
        self.train_step = self._steps_for(render_cfg)[0]
        self.eval_step = self._steps_for(render_cfg)[1]

        self.train_pipeline = train_pipeline
        self.test_pipeline = test_pipeline
        self.rng = jax.random.PRNGKey(seed)
        # hot-loop step seeds: (seed, counter) int32 pairs, one upload each
        self._base_seed = int(seed) & 0x7FFFFFFF
        self._seed_counter = 0

        self.writer = None
        if os.environ.get("PIXELNERF_NO_TB") != "1":
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(self._log_dir)
            except Exception:
                pass

    def _steps_for(self, cfg: RenderConfig):
        """Compiled (train_step, eval_step) for a render config, cached —
        the sample-count schedule switches between a few static configs."""
        if cfg not in self._step_cache:
            self._step_cache[cfg] = (
                make_train_step(
                    self.net, cfg, self.optimizer, self.loss_fn,
                    mesh=self.mesh, train_encoder=self.train_encoder,
                    ray_chunk=self.train_ray_chunk,
                    remat=self.train_remat,
                ),
                make_eval_step(self.net, cfg, self.loss_fn, mesh=self.mesh),
            )
        return self._step_cache[cfg]

    # -- hooks ---------------------------------------------------------------

    def post_batch(self, epoch: int, batch_idx: int) -> None:
        pass

    def extra_save_state(self) -> None:
        pass

    # -- loop ----------------------------------------------------------------

    def _next_key(self):
        self.rng, key = jax.random.split(self.rng)
        return key

    def _next_seed(self):
        """Host-side RNG seed for the hot train-step path: an int32
        (trainer_seed, counter) pair; the step derives
        ``fold_in(PRNGKey(seed), counter)`` on-device. ``_next_key``'s
        device-side split is a separate dispatch per call — through a
        remoted TPU runtime that round trip costs a large fraction of a
        train step."""
        self._seed_counter += 1
        return np.array([self._base_seed, self._seed_counter], np.int32)

    def _log(self, tag, scalars, step):
        if self.writer is not None:
            for k, v in scalars.items():
                self.writer.add_scalar(f"{tag}/{k}", float(v), step)

    def start(self):
        import os as _os

        _time_loop = _os.environ.get("PIXELNERF_TIME_LOOP") == "1"
        _bare = _os.environ.get("PIXELNERF_BARE_LOOP") == "1"
        train_iter = iter(self.train_pipeline)
        test_iter = iter(self.test_pipeline) if self.test_pipeline else None
        t_last = time.time()
        # deferred (epoch, batch_idx, step, metrics, dt) to print: dt is
        # measured when the interval's metrics are captured, so the printed
        # timing matches the labeled batch (not the following interval)
        self._pending = None
        try:
            self._run_epochs(train_iter, test_iter, t_last, _time_loop, _bare)
        finally:
            # flush the deferred interval so the run's final metrics (and a
            # short or interrupted run's only metrics) are printed and logged
            pending = self._pending
            if pending is not None:
                p_epoch, p_bidx, p_step, p_metrics, p_dt = pending
                p_metrics = {k: float(v) for k, v in p_metrics.items()}
                print(
                    f"E{p_epoch} B{p_bidx} "
                    + " ".join(f"{k}:{v:.5f}" for k, v in p_metrics.items())
                    + f" ({p_dt:.2f}s)"
                )
                self._log("train", p_metrics, p_step)
                self._pending = None

    def _run_epochs(self, train_iter, test_iter, t_last, _time_loop, _bare):
        self._pending = None
        for epoch in range(self.num_epochs):
            for batch_idx in range(self.epoch_batches * self.num_epoch_repeats):
                _t0 = time.time()
                batch = next(train_iter)
                batch = {k: v for k, v in batch.items() if k != "step"}
                if self.mesh is not None:
                    from ..parallel.mesh import shard_batch

                    batch = shard_batch(self.mesh, batch)
                if self.render_schedule is not None:
                    cfg = self.render_schedule.at_step(self._host_step)
                    if cfg not in self._step_cache:
                        print(
                            "INFO: sampling resolution changed on schedule "
                            f"==> c {cfg.n_coarse} f {cfg.n_fine}"
                        )
                    self.train_step, self.eval_step = self._steps_for(cfg)
                _t1 = time.time()
                self.state, metrics = self.train_step(
                    self.state, batch, self._next_seed()
                )
                _t2 = time.time()
                self._host_step += 1
                step = self._host_step
                if _time_loop:
                    print(
                        f"[time] data {_t1-_t0:.3f}s dispatch {_t2-_t1:.3f}s "
                        f"sync {time.time()-_t2:.3f}s"
                    )

                if _bare:
                    continue
                if batch_idx % self.print_interval == 0:
                    # print the *previous* interval's metrics: they are done
                    # on-device by now, so float() doesn't stall the pipeline
                    # (fetching this batch's metrics would block on the step
                    # dispatched two lines up)
                    dt = time.time() - t_last
                    t_last = time.time()
                    if self._pending is not None:
                        p_epoch, p_bidx, p_step, p_metrics, p_dt = self._pending
                        # ONE transfer for the whole dict: per-key float()
                        # is one device_get round trip each
                        p_metrics = {
                            k: float(v)
                            for k, v in jax.device_get(p_metrics).items()
                        }
                        print(
                            f"E{p_epoch} B{p_bidx} "
                            + " ".join(
                                f"{k}:{v:.5f}" for k, v in p_metrics.items()
                            )
                            + f" ({p_dt:.2f}s)"
                        )
                        self._log("train", p_metrics, p_step)
                    self._pending = (epoch, batch_idx, step, metrics, dt)

                if test_iter is not None and batch_idx % self.eval_interval == 1:
                    test_batch = next(test_iter)
                    test_batch = {
                        k: v for k, v in test_batch.items() if k != "step"
                    }
                    test_metrics = self.eval_step(
                        self.state.variables, test_batch, self._next_key()
                    )
                    test_metrics = {k: float(v) for k, v in test_metrics.items()}
                    print(
                        f"*** eval: "
                        + " ".join(f"{k}:{v:.5f}" for k, v in test_metrics.items())
                    )
                    self._log("test", test_metrics, step)

                if batch_idx % self.save_interval == 1 and (epoch > 0 or batch_idx > 0):
                    save_checkpoint(self.ckpt_dir, self.state)
                    self.extra_save_state()

                if self.vis_fn is not None and batch_idx % self.vis_interval == 1:
                    vis, vis_metrics = self.vis_fn(
                        self.state, self._next_key(), epoch, batch_idx
                    )
                    if vis is not None:
                        self._save_visual(vis, epoch, batch_idx)
                    if vis_metrics:
                        self._log("vis", vis_metrics, step)

                self.post_batch(epoch, batch_idx)
            save_checkpoint(self.ckpt_dir, self.state)

    def _save_visual(self, vis: np.ndarray, epoch: int, batch_idx: int):
        import imageio.v2 as imageio

        path = os.path.join(self.visual_dir, f"{epoch:04d}_{batch_idx:04d}_vis.png")
        imageio.imwrite(path, (np.clip(vis, 0, 1) * 255).astype(np.uint8))
