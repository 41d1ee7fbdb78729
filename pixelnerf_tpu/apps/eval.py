"""Full evaluation sweep (reference eval/eval.py).

Per test object: encode fixed (-P) or viewlist (-L) source views, render every
other view, write PNGs, accumulate PSNR/SSIM, and append to an append-only
``finish.txt`` so interrupted multi-hour sweeps resume where they stopped
(reference eval.py:112-131). Rays are sharded over the device mesh.

    python -m pixelnerf_tpu.apps.eval -n srn_car -D <data>/cars -P "64" -O eval_out
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigNode
from ..data import dataset_kwargs_from_conf, get_split_dataset
from ..eval.common import FullRenderer
from ..models import make_model
from ..parallel.mesh import make_mesh
from ..render.renderer import RenderConfig
from ..train.state import load_variables
from ..utils import geometry, metrics
from .args import parse_args


def extra_args(parser):
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--source", "-P", type=str, default="64",
                        help="space-separated source view ids")
    parser.add_argument("--viewlist", "-L", type=str, default="",
                        help="path to per-object source-view list file")
    parser.add_argument("--include_src", action="store_true")
    parser.add_argument("--multicat", action="store_true")
    parser.add_argument("--output", "-O", type=str, default="eval_out")
    parser.add_argument("--write_depth", action="store_true")
    parser.add_argument("--write_compare", action="store_true",
                        help="also write side-by-side [gt | render] images")
    parser.add_argument("--coarse", action="store_true",
                        help="render coarse-only with a 64/128 sample "
                        "hierarchy (reference eval.py:139-148)")
    parser.add_argument("--limit", type=int, default=None,
                        help="evaluate at most N objects (smoke runs)")
    parser.add_argument("--eval_view_list", type=str, default=None,
                        help="file whose first line lists the target view "
                        "ids to evaluate (reference eval.py:45,169-176)")
    parser.add_argument("--no_compare_gt", action="store_true",
                        help="skip GT comparison (no metrics), only render")
    parser.add_argument("--scale", type=float, default=1.0,
                        help="render scale relative to input size "
                        "(reference eval.py:77)")
    parser.add_argument("--free_pose", action="store_true",
                        help="accepted for reference-CLI compatibility; "
                        "this implementation regenerates rays per object "
                        "unconditionally, so varying poses are always "
                        "handled (reference eval.py:84-86,218)")
    parser.add_argument("--no_mesh", action="store_true")
    parser.add_argument("--seed", type=int, default=0)


def load_net_and_state(args, conf, sample_batch_fn):
    """Build model and restore from our checkpoint or a reference torch one."""
    net = make_model(conf["model"])
    variables = sample_batch_fn(net)
    ckpt_dir = os.path.join(args.checkpoints_path, args.name)
    torch_path = os.path.join(ckpt_dir, "pixel_nerf_latest")
    restored = load_variables(ckpt_dir)
    if restored is not None:
        step = restored.pop("step", 0)
        import numpy as _np

        print(f"Loaded checkpoint at step {int(_np.asarray(step))} from {ckpt_dir}")
        return net, restored
    if os.path.exists(torch_path):
        from ..models.torch_import import load_torch_checkpoint

        print(f"Loaded reference torch checkpoint {torch_path}")
        loaded = load_torch_checkpoint(torch_path)
        variables = {**variables, **loaded}
        return net, variables
    print("WARNING: no checkpoint found; evaluating a random-init model")
    return net, variables


def main(argv=None):
    args, conf = parse_args(extra_args, argv=argv)
    dset = get_split_dataset(
        args.dataset_format, args.datadir, want_split=args.split, training=False,
        **dataset_kwargs_from_conf(conf),
    )
    cfg = RenderConfig.from_conf(
        conf.get_config("renderer", ConfigNode()),
        lindisp=getattr(dset, "lindisp", False),
        eval_batch_size=args.ray_batch_size,
    )
    import dataclasses

    if cfg.n_coarse < 64:
        # ensure decent sampling resolution (reference eval.py:142-143)
        cfg = dataclasses.replace(cfg, n_coarse=64)
    if args.coarse:
        # reference eval.py:139-148: drop the fine MLP but KEEP the 64+128
        # hierarchical sampling — both passes run through the coarse MLP
        cfg = dataclasses.replace(cfg, n_coarse=64, n_fine=128)

    source = np.array([int(x) for x in args.source.split()])
    viewlist = {}
    if args.viewlist:
        with open(args.viewlist, "r") as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) >= 3:
                    viewlist[(parts[0], parts[1])] = [int(x) for x in parts[2:]]

    d0 = dset[0]
    H, W = d0["images"].shape[1:3]

    def init_fn(net):
        NS = len(source)
        return net.init(
            jax.random.PRNGKey(0),
            jnp.asarray(d0["images"][None, :NS]), jnp.asarray(d0["poses"][None, :NS]),
            jnp.asarray(d0["focal"]), jnp.zeros((1, 8, 3)), jnp.ones((1, 8, 3)),
        )

    net, variables = load_net_and_state(args, conf, init_fn)
    if args.coarse:
        net = net.clone(mlp_fine=None)  # fine pass reuses the coarse MLP

    mesh = None
    if not args.no_mesh and jax.device_count() > 1:
        mesh = make_mesh()
    renderer = FullRenderer(net, cfg, mesh=mesh, ray_chunk=args.ray_batch_size)

    os.makedirs(args.output, exist_ok=True)
    finish_path = os.path.join(args.output, "finish.txt")
    finished = {}
    if os.path.exists(finish_path):
        with open(finish_path, "r") as f:
            for line in f:
                parts = line.split()
                if len(parts) == 4:
                    finished[parts[0]] = (float(parts[1]), float(parts[2]), int(parts[3]))
    finish_file = open(finish_path, "a", buffering=1)

    total_psnr = sum(v[0] * v[2] for v in finished.values())
    total_ssim = sum(v[1] * v[2] for v in finished.values())
    cnt = sum(v[2] for v in finished.values())

    import imageio.v2 as imageio

    # optional target-view subset (reference eval.py:169-176: first line of
    # the file lists the view ids to evaluate)
    eval_views = None
    if args.eval_view_list:
        with open(args.eval_view_list, "r") as f:
            eval_views = {int(x) for x in f.readline().split()}

    rng = jax.random.PRNGKey(args.seed)
    n_objs = len(dset) if args.limit is None else min(args.limit, len(dset))
    for obj_idx in range(n_objs):
        data = dset[obj_idx]
        if not data:
            continue
        if args.multicat:
            cat = os.path.basename(os.path.dirname(data["path"]))
            obj_name = f"{cat}_{os.path.basename(data['path'])}"
        else:
            obj_name = os.path.basename(data["path"])
        if obj_name in finished:
            continue

        NV = data["images"].shape[0]
        key = (
            os.path.basename(os.path.dirname(data["path"])),
            os.path.basename(data["path"]),
        )
        src = np.array(viewlist[key]) if key in viewlist else source
        src = src[src < NV]
        target_views = (
            np.arange(NV)
            if args.include_src
            else np.array([v for v in range(NV) if v not in set(src.tolist())])
        )
        if eval_views is not None:
            target_views = np.array(
                [v for v in target_views if v in eval_views]
            )
            if target_views.size == 0:
                print(f"skip {obj_name}: no target views in eval_view_list")
                continue

        # render size: --scale relative to input (reference eval.py:207-213,
        # 252-255 — focal and principal point scale with the image)
        rH, rW = int(round(H * args.scale)), int(round(W * args.scale))
        c_arr = data.get("c", np.array([W / 2.0, H / 2.0], np.float32))
        enc = net.apply(
            variables,
            jnp.asarray(data["images"][None, src]),
            jnp.asarray(data["poses"][None, src]),
            jnp.asarray(data["focal"]),
            c=jnp.asarray(c_arr[None]),
            method=net.encode,
        )
        all_rays = np.asarray(
            geometry.gen_rays(
                jnp.asarray(data["poses"][target_views]), rW, rH,
                jnp.asarray(data["focal"] * args.scale),
                dset.z_near, dset.z_far,
                c=jnp.asarray(c_arr * args.scale),
            )
        ).reshape(-1, 8)
        rng, kk = jax.random.split(rng)
        out = renderer(variables, enc, all_rays, kk)
        branch = out["fine"] if cfg.using_fine else out["coarse"]
        rgb_all = branch["rgb"].reshape(len(target_views), rH, rW, 3)
        depth_all = branch["depth"].reshape(len(target_views), rH, rW)

        obj_dir = os.path.join(args.output, obj_name)
        os.makedirs(obj_dir, exist_ok=True)
        obj_psnr = obj_ssim = 0.0
        for ti, view in enumerate(target_views):
            pred = np.clip(rgb_all[ti], 0, 1)
            gt = data["images"][view] * 0.5 + 0.5
            if args.scale != 1.0:
                import cv2

                gt = np.clip(
                    cv2.resize(gt, (rW, rH), interpolation=cv2.INTER_AREA),
                    0.0, 1.0,
                )
            if not args.no_compare_gt:
                p = metrics.psnr(pred, gt)
                s = metrics.ssim(pred, gt, data_range=1.0)
                obj_psnr += p
                obj_ssim += s
            imageio.imwrite(
                os.path.join(obj_dir, f"{view:06d}.png"),
                (pred * 255).astype(np.uint8),
            )
            if args.write_compare:
                compare = np.concatenate([gt, pred], axis=1)
                imageio.imwrite(
                    os.path.join(obj_dir, f"{view:06d}_compare.png"),
                    (np.clip(compare, 0, 1) * 255).astype(np.uint8),
                )
            if args.write_depth:
                # normalized depth EXR + colormapped PNG (ref eval.py:291-310)
                from ..eval.common import depth_cmap
                from ..utils.exr import write_exr

                depth_norm = (depth_all[ti] - dset.z_near) / (
                    dset.z_far - dset.z_near
                )
                write_exr(
                    os.path.join(obj_dir, f"{view:06d}_depth.exr"),
                    np.asarray(depth_norm, np.float32),
                )
                imageio.imwrite(
                    os.path.join(obj_dir, f"{view:06d}_depth_norm.png"),
                    (depth_cmap(depth_all[ti], dset.z_near, dset.z_far) * 255).astype(
                        np.uint8
                    ),
                )
        n = len(target_views)
        obj_psnr /= n
        obj_ssim /= n
        total_psnr += obj_psnr * n
        total_ssim += obj_ssim * n
        cnt += n
        print(
            f"[{obj_idx+1}/{n_objs}] {obj_name} psnr {obj_psnr:.3f} ssim {obj_ssim:.4f}"
            f" | running psnr {total_psnr/cnt:.3f} ssim {total_ssim/cnt:.4f}"
        )
        finish_file.write(f"{obj_name} {obj_psnr} {obj_ssim} {n}\n")
    finish_file.close()
    if cnt:
        print(f"FINAL psnr {total_psnr/cnt:.4f} ssim {total_ssim/cnt:.4f} over {cnt} views")


if __name__ == "__main__":
    main()
