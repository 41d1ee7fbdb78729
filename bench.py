"""Render-throughput benchmark (the driver runs this on real TPU hardware).

Measures full conditional-NeRF rendering — encode once, then hierarchical
render (64 coarse + 32 fine samples/ray, the reference's shipped config) —
and reports rays/sec/chip against the BASELINE.json target of 1e7.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_RAYS_PER_SEC = 1.0e7


def main():
    import jax
    import jax.numpy as jnp

    from pixelnerf_tpu.config import load_config
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.render.renderer import RenderConfig, render_rays_chunked
    from pixelnerf_tpu.utils import geometry

    root = os.path.dirname(os.path.abspath(__file__))
    conf = load_config(os.path.join(root, "conf", "exp", "srn.conf"))
    conf["model"]["dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
    net = make_model(conf["model"])
    cfg = RenderConfig(n_coarse=64, n_fine=32, n_fine_depth=16, white_bkgd=True)

    # SRN-car geometry: 128x128 source image(s). BENCH_VIEWS=N measures
    # N-view conditioning (the DTU tracked config uses 3): per-point work
    # before the combine layer scales with NS.
    SB, H, W = 1, 128, 128
    NS = int(os.environ.get("BENCH_VIEWS", 1))
    n_rays = int(os.environ.get("BENCH_RAYS", 65536))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (SB, NS, H, W, 3)).astype(np.float32))
    pose = np.stack([
        geometry.look_at(
            np.array([np.sin(0.4 * v), 0.2 * v, 1.3 * np.cos(0.4 * v)],
                     np.float32),
            np.zeros(3),
        )
        for v in range(NS)
    ])
    poses = jnp.asarray(pose[None])
    focal = jnp.asarray(np.float32(131.25))

    variables = net.init(
        jax.random.PRNGKey(0), images, poses, focal,
        jnp.zeros((SB, 8, 3)), jnp.ones((SB, 8, 3)),
    )
    enc = net.apply(variables, images, poses, focal, method=net.encode)

    # Fold the MLPs' latent-injection GEMMs into the feature map (exact;
    # see models.pixelnerf.bake_encoding). Off by default on v5e: measured
    # 80.2k vs 100.7k rays/s — the 3x-wider gather rows cost more than the
    # saved GEMM (the XLA gather is only partially index-bound: 4-corner
    # bf16 at C=512 runs 11.3 ms/393k pts vs 20.4 ms at C=1536).
    if os.environ.get("BENCH_BAKED", "0") == "1":
        from pixelnerf_tpu.models import bake_encoding

        enc = bake_encoding(net, variables, enc)

    cam_rays = np.asarray(
        geometry.gen_rays(poses[:, 0], W, H, focal, 0.8, 1.8)
    ).reshape(1, -1, 8)
    reps = max(1, n_rays // cam_rays.shape[1])
    rays = jnp.asarray(np.tile(cam_rays, (1, reps, 1))[:, :n_rays])

    ray_chunk = int(os.environ.get("BENCH_CHUNK", 4096))

    # The fused Pallas MLP kernel (BENCH_FAST=1) matches but does not beat
    # XLA here — the XLA bf16 path already runs at ~87% of MXU peak.
    fast = os.environ.get("BENCH_FAST", "0") == "1"

    # staged render: fine pass reuses the coarse samples' gathered features
    # (exact; see render_rays docstring). ~40% fewer gather points. Feature
    # reuse across passes is only valid when the gather output is MLP-
    # agnostic: a baked encoding holds per-MLP injection maps, so staged +
    # baked (with a separate fine MLP) must fall back to the unstaged path.
    staged = os.environ.get("BENCH_STAGED", "1") == "1"
    baked = os.environ.get("BENCH_BAKED", "0") == "1"
    if staged and baked and net.mlp_fine is not None:
        print("# staged disabled: baked encodings are per-MLP", file=sys.stderr)
        staged = False

    # BENCH_FUSED_GATHER=1: route queries through the single-kernel
    # gather+MLP path (ops/fused_field.py) — gather pipelined against the
    # MLP GEMMs inside one Pallas kernel. Unstaged by construction (the
    # kernel re-gathers the fine pass, betting the overlap hides it).
    fused_gather = os.environ.get("BENCH_FUSED_GATHER", "0") == "1"
    if fused_gather:
        from pixelnerf_tpu.models.pixelnerf import pack_encoding

        assert not baked, "fused gather path is incompatible with baking"
        enc = pack_encoding(net, enc)
        staged = False

    @jax.jit
    def render(variables, enc, rays, key):
        if fused_gather:
            def query_fn(xyz, viewdirs, coarse):
                return net.apply(
                    variables, enc, xyz, viewdirs=viewdirs, coarse=coarse,
                    method=net.query_fused,
                )
        else:
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

        q = (features_fn, mlp_fn) if staged else query_fn
        out = render_rays_chunked(
            q, rays, key, cfg, ray_chunk=ray_chunk, use_viewdirs=True
        )
        # scalar checksum: device_get on it is the only reliable execution
        # barrier through remoted TPU runtimes (block_until_ready returns
        # before device execution completes there)
        checksum = out["fine"]["rgb"].sum() + out["fine"]["depth"].sum()
        return out["fine"]["rgb"], out["fine"]["depth"], checksum

    key = jax.random.PRNGKey(1)
    out = render(variables, enc, rays, key)
    jax.device_get(out[2])  # compile + sync

    n_iters = int(os.environ.get("BENCH_ITERS", 10))
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = render(variables, enc, rays, jax.random.fold_in(key, i))
    jax.device_get(out[2])
    dt = time.perf_counter() - t0

    rays_per_sec = n_rays * n_iters / dt

    # --- analytic MFU: model FLOPs per ray at this fidelity vs chip peak ---
    mlp = net.mlp_coarse
    n_lin_z = min(mlp.combine_layer, mlp.n_blocks)
    dh, dl, din = mlp.d_hidden, mlp.d_latent, mlp.d_in
    # a baked encoding folds the lin_z GEMMs into the feature map at encode,
    # so those MACs are not executed per point — exclude them from the MFU
    lin_z_macs = 0 if baked else dl * n_lin_z * dh
    # blocks before the combine layer (and lin_in/lin_z) run once per source
    # view; blocks after run on the view-combined state
    pre = min(mlp.combine_layer, mlp.n_blocks)
    per_view = din * dh + lin_z_macs + pre * 2 * dh * dh
    post = (mlp.n_blocks - pre) * 2 * dh * dh + dh * 4
    if pre == mlp.n_blocks:
        per_view += dh * 4
        post = 0
    macs_per_pt = NS * per_view + post
    pts_per_ray = cfg.n_coarse + (cfg.n_coarse + cfg.n_fine)
    flops_per_ray = 2 * macs_per_pt * pts_per_ray
    V5E_BF16_PEAK = 197e12
    mfu = rays_per_sec * flops_per_ray / V5E_BF16_PEAK

    # --- multi-chip story: virtual-mesh scaling subprocess (VERDICT #10) ---
    mesh = None
    if os.environ.get("BENCH_MESH", "1") == "1":
        import subprocess

        root = os.path.dirname(os.path.abspath(__file__))
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = [
            f for f in env.get("XLA_FLAGS", "").split()
            if "host_platform_device_count" not in f
        ]
        flags.append("--xla_force_host_platform_device_count=8")
        env["XLA_FLAGS"] = " ".join(flags)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(root, "scripts", "mesh_bench.py")],
                env=env, cwd=root, capture_output=True, text=True, timeout=300,
            )
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    mesh = json.loads(line)
                    break
                except ValueError:
                    continue
        except Exception:
            mesh = None

    print(
        json.dumps(
            {
                "metric": "render_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
                "model_tflops_per_sec": round(
                    rays_per_sec * flops_per_ray / 1e12, 1
                ),
                "mfu_vs_v5e_bf16_peak": round(mfu, 3),
                "flops_per_ray": flops_per_ray,
                "mesh_scaling": mesh,
            }
        )
    )


if __name__ == "__main__":
    main()
