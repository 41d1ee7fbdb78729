"""The compiled training step: encode + render + loss + grad + update,
sharded over the device mesh.

One jit region replaces the reference's train_step (train/train.py:117-218):
the CNN encode (which the reference ran un-parallelized on GPU0;
SURVEY §2.2) is inside the compiled step with the object batch sharded over
the ``data`` axis, rays additionally sharded over the ``ray`` axis, params
replicated — XLA inserts the gradient all-reduce (the DataParallel gradient
path, but compiled and ICI-resident).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.ad_checkpoint import checkpoint_name
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.renderer import RenderConfig, render_rays, render_rays_chunked
from .state import TrainState


def make_train_step(
    net,
    cfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    loss_fn,
    mesh: Optional[Mesh] = None,
    train_encoder: bool = True,
    ray_chunk: Optional[int] = None,
    remat=True,
):
    """Build ``step(state, batch, rng) -> (state, metrics)``, jitted.

    batch: images (SB, NS, H, W, 3), poses, focal, c, rays (SB, R, 8),
    rgb_gt (SB, R, 3). All leading dims static per (SB, NS, R) combination.
    """

    def loss_and_updates(params, batch_stats, batch, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

        mutable = ["batch_stats"] if (batch_stats and train_encoder) else []
        enc_out = net.apply(
            variables,
            batch["images"],
            batch["poses"],
            batch["focal"],
            c=batch.get("c"),
            train=train_encoder,
            method=net.encode,
            mutable=mutable,
        )
        if mutable:
            enc, mutated = enc_out
            new_stats = mutated["batch_stats"]
        else:
            enc, new_stats = enc_out, batch_stats

        # staged query: the fine pass reuses the coarse samples' gathered
        # features (bit-identical values => identical gradients; see
        # render_rays). The feature stage is the gather-bound part, so this
        # also trims the backward's scatter-add work.
        # The outputs carry a checkpoint name so the "features" remat policy
        # can SAVE the gathered features while rematerializing only the
        # MXU-cheap MLP GEMMs (a no-op identity under any other policy).
        def features_fn(xyz, viewdirs):
            feats = net.apply(
                variables, enc, xyz, viewdirs=viewdirs,
                method=net.query_features,
            )
            return jax.tree_util.tree_map(
                lambda x: checkpoint_name(x, "gathered_features"), feats
            )

        def mlp_fn(feats, coarse):
            return net.apply(
                variables, enc, feats, coarse=coarse, method=net.query_mlp
            )

        q = (features_fn, mlp_fn)
        if ray_chunk is not None and batch["rays"].shape[1] > ray_chunk:
            # scan over ray microbatches to bound activation memory at large
            # per-object ray counts; gradients flow through the scan
            outputs = render_rays_chunked(
                q, batch["rays"], rng, cfg, ray_chunk, train=True,
                use_viewdirs=net.use_viewdirs, remat=remat,
            )
        else:
            outputs = render_rays(
                q, batch["rays"], rng, cfg, train=True,
                use_viewdirs=net.use_viewdirs,
            )
        loss, metrics = loss_fn(outputs, batch["rgb_gt"])
        return loss, (new_stats, metrics)

    def step(state: TrainState, batch, rng):
        # rng may be a PRNG key array OR a host int seed: the trainer's hot
        # loop passes a plain int32 counter (uploaded with the dispatch) and
        # the key is derived on-device — a host-side jax.random.split per
        # batch is a separate dispatch round trip, which through a remoted
        # TPU runtime costs a large fraction of the step itself
        rng = jnp.asarray(rng)
        if rng.ndim == 0:
            rng = jax.random.PRNGKey(rng)
        elif rng.dtype == jnp.int32 and rng.shape == (2,):
            # (trainer_seed, step_counter) pair: one host upload, and the
            # stream is fold_in(PRNGKey(seed), counter) — distinct trainer
            # seeds can never share a step-key sequence (an int32 counter
            # alone would alias seeds through partition arithmetic)
            rng = jax.random.fold_in(jax.random.PRNGKey(rng[0]), rng[1])
        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_and_updates, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        # global gradient norm: cheap (one reduction), standard training
        # telemetry, and the instrument the multichip dryrun uses to certify
        # the psum gradient path numerically (sharded == single device)
        metrics = dict(metrics, gnorm=optax.global_norm(grads))
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    from ..parallel.mesh import BATCH_KEYS, DATA_AXIS, RAY_AXIS, RAY_AXIS_KEYS

    rep = NamedSharding(mesh, P())
    # one schema, declared in parallel/mesh.py, shared with shard_batch —
    # drifting copies would mis-shard new batch entries at runtime
    batch_shardings = {
        k: NamedSharding(
            mesh,
            P(DATA_AXIS, RAY_AXIS) if k in RAY_AXIS_KEYS else P(DATA_AXIS),
        )
        for k in BATCH_KEYS
    }
    return jax.jit(
        step,
        in_shardings=(rep, batch_shardings, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_eval_step(net, cfg: RenderConfig, loss_fn, mesh: Optional[Mesh] = None):
    """Loss-only step on a held-out batch (reference eval_step)."""

    def step(variables, batch, rng):
        enc = net.apply(
            variables, batch["images"], batch["poses"], batch["focal"],
            c=batch.get("c"), method=net.encode,
        )

        def features_fn(xyz, viewdirs):
            return net.apply(
                variables, enc, xyz, viewdirs=viewdirs,
                method=net.query_features,
            )

        def mlp_fn(feats, coarse):
            return net.apply(
                variables, enc, feats, coarse=coarse, method=net.query_mlp
            )

        outputs = render_rays(
            (features_fn, mlp_fn), batch["rays"], rng, cfg,
            use_viewdirs=net.use_viewdirs,
        )
        _, metrics = loss_fn(outputs, batch["rgb_gt"])
        return metrics

    return jax.jit(step)
