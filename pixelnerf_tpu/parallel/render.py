"""Sharded rendering: rays over chips, zero per-ray communication.

``make_sharded_render`` compiles the full hierarchical render with the ray
batch sharded across the mesh and params/encoding replicated — the compiled,
persistent-layout equivalent of the reference wrapping its renderer in
``DataParallel(dim=1)`` per call (nerf.py:370). Only the final (rgb, depth)
are gathered, mirroring ``simple_output`` (nerf.py:363).
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

from ..render.renderer import RenderConfig, render_rays, render_rays_chunked
from .mesh import ray_sharding, replicate


def make_sharded_render(
    net,
    cfg: RenderConfig,
    mesh: Mesh,
    want_weights: bool = False,
    ray_chunk: Optional[int] = None,
):
    """Build jitted ``render(variables, enc, rays, rng) -> outputs``.

    ``rays`` is (SB, B, 8) with B sharded across every mesh axis; results
    come back fully replicated (gathered) per the output sharding.
    """

    def _render(variables, enc, rays, rng):
        def query_fn(xyz, viewdirs, coarse):
            return net.apply(
                variables, enc, xyz, viewdirs=viewdirs, coarse=coarse,
                method=net.query,
            )

        if ray_chunk is not None:
            return render_rays_chunked(
                query_fn, rays, rng, cfg, ray_chunk,
                want_weights=want_weights, use_viewdirs=net.use_viewdirs,
            )
        return render_rays(
            query_fn, rays, rng, cfg,
            want_weights=want_weights, use_viewdirs=net.use_viewdirs,
        )

    rep = replicate(mesh)
    return jax.jit(
        _render,
        in_shardings=(rep, rep, ray_sharding(mesh), rep),
        out_shardings=rep,
    )


def shard_rays(mesh: Mesh, rays):
    """Place a (SB, B, 8) ray array with B sharded across the mesh."""
    return jax.device_put(rays, ray_sharding(mesh))
