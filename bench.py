"""Render-throughput benchmark (the driver runs this on real TPU hardware).

Measures full conditional-NeRF rendering — encode once, then hierarchical
render (n_coarse=64, n_fine=32 with a 96-sample fine pass, the reference's
shipped config) — and reports rays/sec/chip against the BASELINE.json
target of 1e7. The JSON artifact also carries:

- ``views``: rays/s + MFU at 1/2/3-view conditioning (the DTU tracked
  config is 3-view)
- ``stages``: isolated feature-stage (camera transform + uv + gather +
  posenc) vs MLP-stage timing at the bench shape
- ``train``: full train-step steps/s + MFU at the reference config
  (SB=4, 128 rays/object) and at a chip-filling config, plus the real
  loop / compiled-step time ratio
- ``mesh_scaling``: virtual 8-device mesh equality + timing subprocess

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_RAYS_PER_SEC = 1.0e7
V5E_BF16_PEAK = 197e12


def _sync(x):
    """Execution barrier that works through the axon tunnel (device_get on a
    scalar; block_until_ready returns early there)."""
    import jax

    jax.device_get(x)


def model_flops_per_ray(net, cfg, NS, baked=False):
    """Analytic field-MLP FLOPs/ray at this fidelity (see PERF.md)."""
    mlp = net.mlp_coarse
    n_lin_z = min(mlp.combine_layer, mlp.n_blocks)
    dh, dl, din = mlp.d_hidden, mlp.d_latent, mlp.d_in
    lin_z_macs = 0 if baked else dl * n_lin_z * dh
    pre = min(mlp.combine_layer, mlp.n_blocks)
    per_view = din * dh + lin_z_macs + pre * 2 * dh * dh
    post = (mlp.n_blocks - pre) * 2 * dh * dh + dh * 4
    if pre == mlp.n_blocks:
        per_view += dh * 4
        post = 0
    macs_per_pt = NS * per_view + post
    if cfg.n_fine > 0:  # fine pass evaluates the sorted union (coarse+fine)
        pts_per_ray = cfg.n_coarse + (cfg.n_coarse + cfg.n_fine)
    else:  # coarse-only fidelity
        pts_per_ray = cfg.n_coarse
    return 2 * macs_per_pt * pts_per_ray


def _build_scene(net, NS, H=128, W=128, SB=1):
    """Random SRN-geometry source views + encoding for the bench model."""
    import jax
    import jax.numpy as jnp

    from pixelnerf_tpu.utils import geometry

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
    poses = jnp.asarray(np.broadcast_to(pose[None], (SB,) + pose.shape))
    focal = jnp.asarray(np.float32(131.25))
    variables = net.init(
        jax.random.PRNGKey(0), images, poses, focal,
        jnp.zeros((SB, 8, 3)), jnp.ones((SB, 8, 3)),
    )
    enc = net.apply(variables, images, poses, focal, method=net.encode)
    cam_rays = np.asarray(
        geometry.gen_rays(poses[:, 0], W, H, focal, 0.8, 1.8)
    ).reshape(SB, -1, 8)
    return variables, enc, images, poses, focal, cam_rays


def _render_rate(net, cfg, NS, n_rays, n_iters, ray_chunk, staged, fast,
                 fused_gather=False, baked=False):
    """rays/s of the full hierarchical render at NS-view conditioning."""
    import jax

    from pixelnerf_tpu.render.renderer import render_rays_chunked

    variables, enc, *_rest, cam_rays = _build_scene(net, NS)
    if baked:
        from pixelnerf_tpu.models import bake_encoding

        enc = bake_encoding(net, variables, enc)
    if fused_gather:
        from pixelnerf_tpu.models.pixelnerf import pack_encoding

        assert not baked, "fused gather path is incompatible with baking"
        enc = pack_encoding(net, enc)
        staged = False

    import jax.numpy as jnp

    reps = max(1, n_rays // cam_rays.shape[1])
    rays = jnp.asarray(np.tile(cam_rays, (1, reps, 1))[:, :n_rays])

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
        branch = out["fine"] if "fine" in out else out["coarse"]
        checksum = branch["rgb"].sum() + branch["depth"].sum()
        return branch["rgb"], branch["depth"], checksum

    key = jax.random.PRNGKey(1)
    out = render(variables, enc, rays, key)
    _sync(out[2])  # compile + sync
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = render(variables, enc, rays, jax.random.fold_in(key, i))
    _sync(out[2])
    dt = time.perf_counter() - t0
    # rays.shape[1], not n_rays: tiling floors to a multiple of the camera
    # grid, so an off-multiple BENCH_RAYS renders slightly fewer rays
    return rays.shape[1] * n_iters / dt


def _bench_stages(net, points=393216):
    """Isolated feature-stage vs MLP-stage latency at the bench shape
    (the features/MLP split PERF.md reports; VERDICT r2 #7)."""
    import jax
    import jax.numpy as jnp

    variables, enc, *_ = _build_scene(net, NS=1)
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (1, points, 3)).astype(np.float32))
    vd = jnp.asarray(rng.normal(size=(1, points, 3)).astype(np.float32))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)

    feat_fn = jax.jit(
        lambda xyz, vd: net.apply(
            variables, enc, xyz, viewdirs=vd, method=net.query_features
        )
    )
    mlp_fn = jax.jit(
        lambda f: net.apply(
            variables, enc, f, coarse=False, method=net.query_mlp
        )
    )

    def timeit(fn, *args, iters=8):
        out = fn(*args)
        _sync(jax.tree_util.tree_leaves(out)[0].sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(jax.tree_util.tree_leaves(out)[0].sum())
        return (time.perf_counter() - t0) / iters

    t_feat = timeit(feat_fn, xyz, vd)
    feats = feat_fn(xyz, vd)
    t_mlp = timeit(mlp_fn, feats)
    return {
        "points": points,
        "features_ms": round(t_feat * 1e3, 2),
        "mlp_ms": round(t_mlp * 1e3, 2),
    }


def _bench_train(root):
    """Full train-step throughput (VERDICT r2 #2): steps/s + train MFU at
    (a) the reference config (SB=4, 128 rays/object, train/train.py:56) and
    (b) a chip-filling config (SB=4, 2048 rays/object, scan-remat chunks),
    plus the real-loop / compiled-step ratio on the synthetic dataset."""
    import jax
    import jax.numpy as jnp
    import optax

    from pixelnerf_tpu.config import ConfigNode, load_config
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.render.renderer import RenderConfig
    from pixelnerf_tpu.train import TrainState, make_render_loss, make_train_step
    from pixelnerf_tpu.utils import geometry

    conf = load_config(os.path.join(root, "conf", "exp", "srn.conf"))
    net = make_model(conf["model"])  # reference parity: f32 compute
    # mixed precision for the chip-filling config: bf16 compute, f32
    # params/optimizer (flax param_dtype default) — measured convergence-
    # equivalent on the synthetic overfit (scripts/probe_bf16_convergence.py)
    conf["model"]["dtype"] = "bfloat16"
    net_mp = make_model(conf["model"])
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

    flops_per_ray = model_flops_per_ray(net, cfg, NS)

    def run_config(R, ray_chunk, iters, step_net=net, remat=True):
        step = make_train_step(
            step_net, cfg, optimizer, loss_fn, mesh=None, ray_chunk=ray_chunk,
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
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        _sync(metrics["t"])  # compile
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = step(state, batch, jax.random.fold_in(
                jax.random.PRNGKey(1), i))
        _sync(metrics["t"])
        dt = (time.perf_counter() - t0) / iters
        rays_per_sec = SB * R / dt
        # train FLOPs ~= 3x forward (fwd + 2x bwd), field math only — the
        # ResNet encode is excluded (it is <4% of the chip-filling config's
        # FLOPs and benchmarked separately in PERF.md)
        mfu = 3 * rays_per_sec * flops_per_ray / V5E_BF16_PEAK
        return {
            "steps_per_sec": round(1.0 / dt, 2),
            "rays_per_sec": round(rays_per_sec, 1),
            "train_mfu": round(mfu, 3),
            "rays_per_object": R,
            "ray_chunk": ray_chunk,
        }, dt

    ref, dt_ref = run_config(R=128, ray_chunk=None, iters=20)
    # chip-filling: bf16 compute (f32 params), 256-ray scan chunks with the
    # "features" remat policy — the measured optimum
    # (scripts/probe_train_{chunk,bf16,roofline}.py: chunk 1024->256 +6%,
    # f32->bf16 +55%, features vs full remat +1%; "dots" remat and larger R
    # both measured slower, remat=False OOMs — PERF.md "Training roofline")
    filling, _ = run_config(R=2048, ray_chunk=256, iters=8, step_net=net_mp,
                            remat="features")
    filling["mixed_precision"] = True

    # real-loop ratio at the reference config: the Trainer loop (host batch
    # assembly from the synthetic dataset + dispatch + deferred metric
    # fetches) over the isolated compiled step. Measurement (fixed in r4;
    # the r3 ratio of 0.86 < 1 was an artifact of timing host pull-to-pull
    # deltas — with deferred metric fetches the host runs AHEAD of the
    # device, so pull deltas measured host batch assembly, not step time):
    # time from the first steady-state pull to an end-of-run device sync
    # (patched into the trainer's end-of-epoch checkpoint hook, BEFORE the
    # disk write), divided by the steps that window covers. Both numerator
    # and dt_ref now end on a device barrier, so they are commensurable.
    loop_ratio = None
    try:
        import contextlib
        import io
        import tempfile
        import unittest.mock as mock

        import jax as _jax

        from pixelnerf_tpu.data.pipeline import RayBatchPipeline
        from pixelnerf_tpu.data.synthetic import SyntheticSphereDataset
        from pixelnerf_tpu.train.trainer import Trainer

        dset = SyntheticSphereDataset(
            num_objects=8, num_views=8, image_size=(H, W)
        )
        # 4 workers: at 2 the pipeline cannot quite feed the 30 steps/s
        # compiled step and data-wait contaminates the ratio
        pipe = RayBatchPipeline(
            dset, batch_size=SB, rays_per_object=128, views=(NS,), workers=4
        )
        n_loop = 30
        head = 3  # drop compile-affected first pulls
        pull_times = []
        sync_times = []

        class TimingPipe:
            def __iter__(self):
                for batch in pipe:
                    pull_times.append(time.perf_counter())
                    yield batch

        def sync_instead_of_save(_dir, state):
            # device barrier: forces completion of every dispatched step
            # (device_get — block_until_ready returns early via the tunnel)
            _jax.device_get(state.step)
            sync_times.append(time.perf_counter())

        conf["train"]["save_interval"] = 10 ** 9
        conf["train"]["vis_interval"] = 10 ** 9
        conf["train"]["eval_interval"] = 10 ** 9
        conf["train"]["print_interval"] = 10 ** 9
        with tempfile.TemporaryDirectory() as td:
            os.environ.setdefault("PIXELNERF_NO_TB", "1")
            trainer = Trainer(
                net, variables, TimingPipe(), None, cfg, conf, name="bench",
                out_dir=td, num_epochs=1, epoch_batches=n_loop,
            )
            with contextlib.redirect_stdout(io.StringIO()), mock.patch(
                "pixelnerf_tpu.train.trainer.save_checkpoint",
                sync_instead_of_save,
            ):
                trainer.start()
        # pull k precedes step k's dispatch; the trainer also saves once at
        # batch_idx==1 (trainer.py:293, 1 % 10**9 == 1), so sync_times holds
        # [early batch-1 sync, end-of-epoch sync] — the LAST one is the
        # barrier that covers all n_loop steps, giving n_loop - head
        # steady-state steps in [pull_times[head], sync_times[-1])
        dt_loop = (sync_times[-1] - pull_times[head]) / (n_loop - head)
        loop_ratio = round(dt_loop / dt_ref, 2)
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"# train loop ratio failed: {e}", file=sys.stderr)

    return {"reference": ref, "chip_filling": filling,
            "loop_over_compiled": loop_ratio}


def _preflight_device(timeout_s: int = 180):
    """Fail fast with a diagnosable message when the TPU tunnel is wedged.

    A wedged axon relay blocks the first device op FOREVER (observed: a
    lost client's grant wedges the pool and every new client sleeps in a
    claim-retry loop). Probe device availability in a SUBPROCESS with a
    bounded wait — a hung probe child is killed without poisoning this
    process — so the bench emits a clear one-line error instead of hanging
    the driver."""
    import subprocess
    import sys

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float(jnp.ones((2,2)).sum()))"],
            capture_output=True, timeout=timeout_s, text=True,
        )
        if proc.returncode == 0 and "4.0" in proc.stdout:
            return
        detail = (proc.stderr or proc.stdout).strip()[-200:]
    except subprocess.TimeoutExpired:
        detail = f"device probe hung >{timeout_s}s (wedged tunnel?)"
    print(json.dumps({
        "metric": "render_rays_per_sec_per_chip", "value": 0.0,
        "unit": "rays/s", "vs_baseline": 0.0,
        "error": f"accelerator unavailable: {detail}",
    }))
    raise SystemExit(3)


def main():
    import jax  # noqa: F401

    if os.environ.get("BENCH_SKIP_PREFLIGHT", "0") != "1":
        _preflight_device()

    from pixelnerf_tpu.config import load_config
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.render.renderer import RenderConfig

    root = os.path.dirname(os.path.abspath(__file__))
    conf = load_config(os.path.join(root, "conf", "exp", "srn.conf"))
    conf["model"]["dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
    net = make_model(conf["model"])
    cfg = RenderConfig(n_coarse=64, n_fine=32, n_fine_depth=16, white_bkgd=True)

    # SRN-car geometry: 128x128 source image(s). BENCH_VIEWS=N sets the
    # headline's N-view conditioning (the DTU tracked config uses 3):
    # per-point work before the combine layer scales with NS.
    NS = int(os.environ.get("BENCH_VIEWS", 1))
    n_rays = int(os.environ.get("BENCH_RAYS", 65536))
    # 256-ray scan microbatches are the measured optimum at every view
    # count (round-3 chunk sweep, PERF.md) — the working set between GEMMs
    # stays VMEM-resident
    ray_chunk = int(os.environ.get("BENCH_CHUNK", 256))
    n_iters = int(os.environ.get("BENCH_ITERS", 10))

    # The fused Pallas MLP kernel (BENCH_FAST=1) matches but does not beat
    # XLA here — the XLA bf16 path already runs at ~87% of MXU peak.
    fast = os.environ.get("BENCH_FAST", "0") == "1"

    # staged render: fine pass reuses the coarse samples' gathered features
    # (exact; see render_rays docstring). ~40% fewer gather points. Feature
    # reuse across passes is only valid when the gather output is MLP-
    # agnostic: a baked encoding holds per-MLP injection maps, so staged +
    # baked (with a separate fine MLP) must fall back to the unstaged path.
    # BENCH_BAKED=1 folds the lin_z GEMMs into the feature map (exact; off
    # by default: measured slower on v5e, see PERF.md). BENCH_FUSED_GATHER=1
    # routes through the single-kernel Pallas gather+MLP (also slower).
    staged = os.environ.get("BENCH_STAGED", "1") == "1"
    baked = os.environ.get("BENCH_BAKED", "0") == "1"
    if staged and baked and net.mlp_fine is not None:
        print("# staged disabled: baked encodings are per-MLP", file=sys.stderr)
        staged = False
    fused_gather = os.environ.get("BENCH_FUSED_GATHER", "0") == "1"
    # BENCH_QUAD=1: 4-corner quad-map gather (one row-gather per point
    # against a 4C-wide corner table instead of 4 C-wide gathers)
    if os.environ.get("BENCH_QUAD", "0") == "1":
        net = net.clone(quad_gather=True)

    rays_per_sec = _render_rate(
        net, cfg, NS, n_rays, n_iters, ray_chunk, staged, fast,
        fused_gather=fused_gather, baked=baked,
    )
    flops_per_ray = model_flops_per_ray(net, cfg, NS, baked=baked)
    mfu = rays_per_sec * flops_per_ray / V5E_BF16_PEAK

    # --- multi-view sweep: 1/2/3-view rays/s + MFU (VERDICT r2 #1/#7) ------
    views = None
    if os.environ.get("BENCH_VIEWS_SWEEP", "1") == "1":
        sweep_rays = int(os.environ.get("BENCH_SWEEP_RAYS", 32768))
        sweep_iters = int(os.environ.get("BENCH_SWEEP_ITERS", 4))
        views = {}
        for ns in (1, 2, 3):
            if ns == NS and not (baked or fused_gather):
                r = rays_per_sec
            else:
                # always re-measure on the default path when the headline
                # ran baked/fused: the sweep's entries must all compare the
                # SAME code path (and its MFU uses unbaked FLOPs)
                r = _render_rate(
                    net, cfg, ns, sweep_rays, sweep_iters, ray_chunk,
                    staged, fast,
                )
            f = model_flops_per_ray(net, cfg, ns)
            views[str(ns)] = {
                "rays_per_sec": round(r, 1),
                "mfu": round(r * f / V5E_BF16_PEAK, 3),
            }

    # --- fidelity-adjusted ceiling + reduced-fidelity fast mode -------------
    # (VERDICT r3 #5) The 1e7 rays/s BASELINE target exceeds what 100% MXU
    # utilization permits at reference fidelity: ceiling = peak / FLOPs-per-
    # ray. Emitting it first-class makes the reconciliation machine-readable;
    # fast_mode shows the framework's rays/s when model FLOPs shrink
    # (coarse-only 64 samples, d_hidden 128) — evidence the headline gap is
    # model physics, not framework overhead.
    ceiling_rays_per_sec = V5E_BF16_PEAK / flops_per_ray
    fast_mode = None
    if os.environ.get("BENCH_FAST_MODE", "1") == "1":
        try:
            conf_fm = load_config(os.path.join(root, "conf", "exp", "srn.conf"))
            conf_fm["model"]["dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
            conf_fm["model"]["mlp_coarse"]["d_hidden"] = 128
            conf_fm["model"]["mlp_fine"] = {"type": "empty"}
            net_fm = make_model(conf_fm["model"])
            cfg_fm = RenderConfig(n_coarse=64, n_fine=0, n_fine_depth=0,
                                  white_bkgd=True)
            r_fm = _render_rate(
                net_fm, cfg_fm, 1, n_rays,
                int(os.environ.get("BENCH_FAST_MODE_ITERS", n_iters)),
                ray_chunk, staged=False, fast=False,
            )
            f_fm = model_flops_per_ray(net_fm, cfg_fm, 1)
            ceil_fm = V5E_BF16_PEAK / f_fm
            # The FLOP ceiling is not the binding constraint here: at
            # d_hidden=128 coarse-only the pixel-aligned gather dominates.
            # Measure the OP floor as the SAME scanned render with a
            # negligible MLP (d_hidden=16): gather/projection/posenc work
            # is unchanged and stays fused in VMEM exactly like the real
            # pipeline (an isolated feature-stage measurement would pay an
            # HBM materialization the fused render never does, and reads
            # ~1.6x slower than the render itself). The d=16 rate is the
            # rays/s the non-MLP ops permit (VERDICT r4 #5).
            conf_fl = load_config(os.path.join(root, "conf", "exp", "srn.conf"))
            conf_fl["model"]["dtype"] = conf_fm["model"]["dtype"]
            conf_fl["model"]["mlp_coarse"]["d_hidden"] = 16
            conf_fl["model"]["mlp_fine"] = {"type": "empty"}
            net_fl = make_model(conf_fl["model"])
            op_floor = _render_rate(
                net_fl, cfg_fm, 1, n_rays,
                int(os.environ.get("BENCH_FAST_MODE_ITERS", n_iters)),
                ray_chunk, staged=False, fast=False,
            )
            ns_per_point = 1e9 / (cfg_fm.n_coarse * op_floor)
            fast_mode = {
                "config": "coarse-only n_coarse=64, d_hidden=128, 1 view",
                "rays_per_sec": round(r_fm, 1),
                "vs_baseline": round(r_fm / BASELINE_RAYS_PER_SEC, 4),
                "flops_per_ray": f_fm,
                "mfu": round(r_fm * f_fm / V5E_BF16_PEAK, 3),
                "ceiling_rays_per_sec": round(ceil_fm, 1),
                "pct_of_ceiling": round(r_fm / ceil_fm, 3),
                "non_mlp_ns_per_point": round(ns_per_point, 1),
                "op_floor_rays_per_sec": round(op_floor, 1),
                "pct_of_op_floor": round(r_fm / op_floor, 3),
            }
            # the fused gather+MLP Pallas kernel targets exactly this
            # single-view coarse-only regime — record it either way
            if os.environ.get("BENCH_FAST_FUSED", "1") == "1":
                try:
                    r_fu = _render_rate(
                        net_fm, cfg_fm, 1, n_rays,
                        int(os.environ.get("BENCH_FAST_MODE_ITERS", n_iters)),
                        ray_chunk, staged=False, fast=False,
                        fused_gather=True,
                    )
                    fast_mode["fused_rays_per_sec"] = round(r_fu, 1)
                    fast_mode["fused_vs_xla"] = round(r_fu / r_fm, 3)
                except Exception as e:  # pragma: no cover - diagnostics
                    fast_mode["fused_rays_per_sec"] = None
                    print(f"# fast-mode fused bench failed: {e}",
                          file=sys.stderr)
        except Exception as e:  # pragma: no cover - diagnostics only
            print(f"# fast-mode bench failed: {e}", file=sys.stderr)

    # --- stage attribution --------------------------------------------------
    stages = None
    if os.environ.get("BENCH_STAGES", "1") == "1":
        try:
            stages = _bench_stages(net)
        except Exception as e:  # pragma: no cover - diagnostics only
            print(f"# stage bench failed: {e}", file=sys.stderr)

    # --- training story -----------------------------------------------------
    train = None
    if os.environ.get("BENCH_TRAIN", "1") == "1":
        try:
            train = _bench_train(root)
        except Exception as e:  # pragma: no cover - diagnostics only
            print(f"# train bench failed: {e}", file=sys.stderr)

    # --- multi-chip story: virtual-mesh scaling subprocess ------------------
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
                # 100%-MXU bound at this fidelity: peak / FLOPs-per-ray. The
                # 1e7 baseline target is ~56x above this bound at reference
                # fidelity — see PERF.md "Reconciling the baseline target".
                "ceiling_rays_per_sec": round(ceiling_rays_per_sec, 1),
                "pct_of_ceiling": round(rays_per_sec / ceiling_rays_per_sec, 3),
                "fast_mode": fast_mode,
                "views": views,
                "stages": stages,
                "train": train,
                "mesh_scaling": mesh,
            }
        )
    )


if __name__ == "__main__":
    main()
