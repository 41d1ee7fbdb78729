"""Shared evaluation machinery: full-frame chunked rendering.

The eval apps render NV*H*W rays per object in fixed-size chunks
(reference eval/eval.py:264-281, gen_video.py:211-218). Here each chunk is
one jitted call with a static shape (compiled once), optionally sharded over
the device mesh; rays are padded to the chunk size so every call hits the
compile cache.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..render.renderer import RenderConfig, render_rays, render_rays_chunked


class FullRenderer:
    """Render an arbitrary number of rays through fixed-shape jitted chunks."""

    def __init__(
        self,
        net,
        cfg: RenderConfig,
        mesh=None,
        ray_chunk: int = 50000,
        want_weights: bool = False,
        fast: bool = False,
        staged: bool = True,
        scan_chunk: int = 256,
    ):
        self.net = net
        self.cfg = cfg
        self.mesh = mesh
        self.scan_chunk = int(scan_chunk)
        # host chunks are scanned on-device in scan_chunk microbatches
        # (memory-bounded, and the per-microbatch working set tunes XLA's
        # fusion efficiency) — round the host chunk to a scan multiple.
        # A request SMALLER than scan_chunk shrinks the scan chunk instead
        # of being silently raised: --ray_batch_size is a memory bound and
        # must be honored downward
        if int(ray_chunk) < self.scan_chunk:
            self.scan_chunk = max(1, int(ray_chunk))
            self.ray_chunk = self.scan_chunk
        else:
            self.ray_chunk = int(ray_chunk) // self.scan_chunk * self.scan_chunk
        self.want_weights = want_weights

        def _render(variables, enc, rays, rng):
            def query_fn(xyz, viewdirs, coarse):
                return net.apply(
                    variables, enc, xyz, viewdirs=viewdirs, coarse=coarse,
                    fast=fast, method=net.query,
                )

            def features_fn(xyz, viewdirs):
                return net.apply(
                    variables, enc, xyz, viewdirs=viewdirs,
                    method=net.query_features,
                )

            def mlp_fn(feats, coarse):
                return net.apply(
                    variables, enc, feats, coarse=coarse, fast=fast,
                    method=net.query_mlp,
                )

            # staged = fine pass reuses coarse-sample features; bit-identical
            # and ~11% faster (see render_rays docstring / PERF.md).
            # Reuse is only valid when gathered features are MLP-agnostic:
            # baked encodings (bake_encoding) hold *per-MLP* injection maps,
            # so with a separate fine MLP the staged pair would feed the fine
            # MLP the coarse MLP's injections — fall back to unstaged there.
            # (tz_coarse is None / not-None is a pytree-structure property,
            # so this branch is resolved at trace time.)
            baked_per_mlp = (
                getattr(enc, "tz_coarse", None) is not None
                and net.mlp_fine is not None
            )
            q = (features_fn, mlp_fn) if (staged and not baked_per_mlp) else query_fn
            # XLA's fusion efficiency peaks at ~256-ray scan microbatches at
            # every view count (the working set stays VMEM-resident between
            # GEMMs; measured NS=1 124.4k rays/s at 256 vs 112.4k at 4096,
            # NS=3 48.8k vs 42.0k — PERF.md round-3 chunk sweep)
            sc = self.scan_chunk
            B = rays.shape[1]
            # mesh path: rays are already split across chips (each chip sees
            # B/n_chips), so keep the single fused render there — scanning a
            # sharded axis would force reshards
            if mesh is None and B > sc and B % sc == 0:
                return render_rays_chunked(
                    q, rays, rng, cfg, sc,
                    want_weights=want_weights, use_viewdirs=net.use_viewdirs,
                )
            return render_rays(
                q, rays, rng, cfg,
                want_weights=want_weights, use_viewdirs=net.use_viewdirs,
            )

        if mesh is None:
            self._render = jax.jit(_render)
            self._place = lambda rays: rays
        else:
            from ..parallel.mesh import ray_sharding, replicate

            rep = replicate(mesh)
            self._render = jax.jit(
                _render,
                in_shardings=(rep, rep, ray_sharding(mesh), rep),
                out_shardings=rep,
            )
            sharding = ray_sharding(mesh)
            self._place = lambda rays: jax.device_put(rays, sharding)

    def __call__(self, variables, enc, rays, rng) -> dict:
        """:param rays: (NR, 8) host or device array
        :return: dict of numpy arrays {'coarse': {'rgb': (NR, 3), ...}, ...}"""
        out = self.render_batch(variables, enc, np.asarray(rays)[None], rng)
        return jax.tree_util.tree_map(lambda x: x[0], out)

    def render_batch(self, variables, enc, rays, rng) -> dict:
        """Batched-object render: rays (SB, NR, 8) against an SB-object
        encoding -> dict of numpy arrays with leading (SB, NR) dims."""
        rays = np.asarray(rays, np.float32)
        SB, NR, _ = rays.shape
        chunk = self.ray_chunk
        outs = []
        for start in range(0, NR, chunk):
            part = rays[:, start : start + chunk]
            n = part.shape[1]
            if n < chunk:
                part = np.concatenate(
                    [part, np.repeat(part[:, -1:], chunk - n, axis=1)], axis=1
                )
            rng, key = jax.random.split(rng)
            out = self._render(variables, enc, self._place(part), key)
            out = jax.device_get(out)
            out = jax.tree_util.tree_map(lambda x: x[:, :n], out)
            outs.append(out)
        return jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=1), *outs
        )

    def render_image(
        self, variables, enc, rays_hw, rng, fine: Optional[bool] = None
    ):
        """:param rays_hw: (H, W, 8) -> (rgb (H, W, 3), depth (H, W))"""
        H, W, _ = rays_hw.shape
        out = self(variables, enc, rays_hw.reshape(-1, 8), rng)
        branch = (
            out["fine"]
            if (fine if fine is not None else self.cfg.using_fine)
            else out["coarse"]
        )
        return (
            branch["rgb"].reshape(H, W, 3),
            branch["depth"].reshape(H, W),
        )


def depth_cmap(depth: np.ndarray, z_near: float = None, z_far: float = None):
    """Colormapped depth visualization (HOT), float [0,1] rgb."""
    import cv2

    d = np.asarray(depth, np.float32)
    vmin = d.min() if z_near is None else z_near
    vmax = d.max() if z_far is None else z_far
    norm = np.clip((d - vmin) / max(vmax - vmin, 1e-10), 0.0, 1.0)
    cm = cv2.applyColorMap((norm * 255).astype(np.uint8), cv2.COLORMAP_HOT)
    return cm[..., ::-1].astype(np.float32) / 255.0  # BGR -> RGB
