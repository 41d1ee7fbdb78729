"""Training CLI (reference train/train.py).

    python -m pixelnerf_tpu.apps.train -n srn_car -c conf/exp/srn.conf \
        -D <data>/cars -V 1 --epochs 100

Supports the synthetic fixture dataset out of the box:

    python -m pixelnerf_tpu.apps.train -n demo -c conf/exp/sn64.conf \
        -F synthetic --epochs 2 --epoch_batches 50
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigNode
from ..data import RayBatchPipeline, dataset_kwargs_from_conf, get_split_dataset
from ..eval.common import FullRenderer, depth_cmap
from ..models import make_model
from ..parallel.mesh import make_mesh
from ..render.renderer import RenderConfig, RenderSchedule
from ..train.trainer import Trainer
from ..utils import geometry, metrics
from ..utils.profiling import trace
from .args import parse_args


def extra_args(parser):
    parser.add_argument("--batch_size", "-B", type=int, default=4)
    parser.add_argument("--nviews", "-V", type=str, default="1",
                        help="source view counts, e.g. '1' or '1 2'")
    parser.add_argument("--freeze_enc", action="store_true")
    parser.add_argument("--no_bbox_step", type=int, default=100000)
    parser.add_argument("--fixed_test", action="store_true")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--gamma", type=float, default=1.0)
    parser.add_argument("--epoch_batches", type=int, default=1000)
    parser.add_argument("--no_mesh", action="store_true",
                        help="disable device-mesh sharding (single chip)")
    parser.add_argument("--train_ray_chunk", type=int, default=None,
                        help="scan the train render in microbatches of this "
                        "many rays (bounds memory at large -R)")
    parser.add_argument("--train_remat", type=str, default="true",
                        choices=["true", "false", "dots", "features"],
                        help="rematerialization policy for the scanned train "
                        "render: true=full remat, false=save everything, "
                        "dots=save GEMM outputs, features=save the gathered "
                        "pixel-aligned features (measured-best on v5e at "
                        "chip-filling configs; PERF.md 'Training roofline')")
    parser.add_argument("--workers", type=int, default=4,
                        help="dataset-loading threads in the input pipeline")
    parser.add_argument("--pretrained_encoder", type=str, default=None,
                        help="torchvision resnet state_dict (.pth) to "
                        "initialize the spatial encoder from ImageNet "
                        "weights, as the reference does")
    parser.add_argument("--seed", type=int, default=0)


def main(argv=None):
    args, conf = parse_args(
        extra_args, training=True, default_ray_batch_size=128, argv=argv
    )
    views = tuple(int(v) for v in args.nviews.split())

    # extra dataset constructor kwargs from the data config subtree
    # (e.g. --override data.num_objects=64 for the synthetic set)
    dset_kwargs = dataset_kwargs_from_conf(conf)
    train_dset = get_split_dataset(
        args.dataset_format, args.datadir, want_split="train", **dset_kwargs
    )
    try:
        test_dset = get_split_dataset(
            args.dataset_format, args.datadir, want_split="val",
            training=False, **dset_kwargs,
        )
    except Exception:
        test_dset = None

    net = make_model(conf["model"], stop_encoder_grad=args.freeze_enc)
    render_cfg = RenderConfig.from_conf(
        conf.get_config("renderer", ConfigNode()),
        lindisp=getattr(train_dset, "lindisp", False),
        eval_batch_size=args.ray_batch_size,
    )

    train_pipe = RayBatchPipeline(
        train_dset,
        batch_size=args.batch_size,
        rays_per_object=args.ray_batch_size,
        views=views,
        no_bbox_step=args.no_bbox_step,
        seed=args.seed,
        workers=args.workers,
    )
    test_pipe = (
        RayBatchPipeline(
            test_dset,
            batch_size=args.batch_size,
            rays_per_object=args.ray_batch_size,
            views=views,
            no_bbox_step=args.no_bbox_step,
            # --fixed_test: deterministic source views for the held-out
            # batches (reference train.py fixed_test flag)
            fixed_source_views=list(range(max(views))) if args.fixed_test else None,
            seed=args.seed + 1,
        )
        if test_dset is not None and len(test_dset) > 0
        else None
    )

    mesh = None
    if not args.no_mesh and jax.device_count() > 1:
        mesh = make_mesh(data=args.mesh_data, ray=args.mesh_ray)
        print("Device mesh:", dict(mesh.shape))

    # init from one pipeline batch
    batch0 = next(iter(RayBatchPipeline(
        train_dset, batch_size=args.batch_size,
        rays_per_object=args.ray_batch_size, views=views[:1], seed=args.seed,
    )))
    variables = net.init(
        jax.random.PRNGKey(args.seed),
        jnp.asarray(batch0["images"]), jnp.asarray(batch0["poses"]),
        jnp.asarray(batch0["focal"]),
        jnp.zeros((args.batch_size, 8, 3)), jnp.ones((args.batch_size, 8, 3)),
        c=jnp.asarray(batch0["c"]),
    )
    if args.pretrained_encoder:
        from ..models.torch_import import load_pretrained_encoder

        # resume (inside Trainer) still wins over this warm start, matching
        # the reference's pretrained-then-load_weights order
        variables = load_pretrained_encoder(variables, args.pretrained_encoder)
        print(f"Encoder initialized from {args.pretrained_encoder}")
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"Model parameters: {n_params/1e6:.2f}M; d_in={net.d_in} d_latent={net.d_latent}")

    # modest chunk: full-frame vis at f32 with multi-view conditioning is the
    # memory high-water mark (activations scale with NS * chunk * samples)
    vis_renderer = FullRenderer(
        net, render_cfg, mesh=mesh, ray_chunk=1024, want_weights=True
    )
    vis_dset = test_dset if test_dset is not None and len(test_dset) > 0 else train_dset

    def vis_step(state, rng, epoch, batch_idx):
        """Render one full novel view: [src | gt | depth | rgb] (reference
        train.py:229-340)."""
        d = vis_dset[int(np.random.default_rng(epoch * 1000 + batch_idx).integers(len(vis_dset)))]
        if not d:
            return None, {}
        NV = d["images"].shape[0]
        src = list(range(min(views[-1], NV - 1)))
        target = NV - 1
        H, W = d["images"].shape[1:3]
        variables = state.variables
        # DTU-style datasets carry a per-object (fx, fy) focal vector; give
        # it the SB batch dim encode expects (scalars broadcast as-is)
        focal = np.asarray(d["focal"], np.float32)
        if focal.ndim == 1:
            focal = focal[None]
        enc = net.apply(
            variables, jnp.asarray(d["images"][None, src]),
            jnp.asarray(d["poses"][None, src]), jnp.asarray(focal),
            c=jnp.asarray(d.get("c", np.array([W / 2, H / 2], np.float32))[None]),
            method=net.encode,
        )
        rays = np.asarray(geometry.gen_rays(
            jnp.asarray(d["poses"][target:target + 1]), W, H,
            jnp.asarray(d["focal"]), vis_dset.z_near, vis_dset.z_far,
            c=jnp.asarray(d.get("c")) if "c" in d else None,
        ))[0]
        out = vis_renderer(variables, enc, rays.reshape(-1, 8), rng)
        gt = d["images"][target] * 0.5 + 0.5
        src_img = d["images"][src[0]] * 0.5 + 0.5

        # reference vis layout (train/train.py:300-329): one row per pass,
        # columns [source | gt | depth cmap | rgb | alpha]
        rows = []
        psnr = None
        for phase in ("coarse", "fine"):
            if phase not in out:
                continue
            rgb = np.clip(out[phase]["rgb"].reshape(H, W, 3), 0, 1)
            depth = out[phase]["depth"].reshape(H, W)
            alpha = out[phase]["weights"].sum(-1).reshape(H, W)
            rows.append(
                np.concatenate(
                    [
                        src_img, gt,
                        depth_cmap(depth, vis_dset.z_near, vis_dset.z_far),
                        rgb,
                        np.repeat(np.clip(alpha, 0, 1)[..., None], 3, -1),
                    ],
                    axis=1,
                )
            )
            psnr = metrics.psnr(rgb, gt)  # fine overwrites coarse
        vis = np.concatenate(rows, axis=0)
        print(f"*** vis psnr {psnr:.2f}")
        return vis, {"psnr": psnr}

    trainer = Trainer(
        net=net,
        variables=variables,
        train_pipeline=train_pipe,
        test_pipeline=test_pipe,
        render_cfg=render_cfg,
        conf=conf,
        name=args.name,
        out_dir=".",
        # honor --checkpoints_path/--visual_path/--logs_path (reference
        # train/trainlib/trainer.py derives its dirs from the same flags)
        ckpt_dir=os.path.join(args.checkpoints_path, args.name),
        visual_dir=os.path.join(args.visual_path, args.name),
        log_dir=os.path.join(args.logs_path, args.name),
        lr=args.lr,
        gamma=args.gamma,
        mesh=mesh,
        num_epochs=args.epochs,
        epoch_batches=args.epoch_batches,
        train_encoder=not args.freeze_enc,
        resume=args.resume,
        vis_fn=vis_step,
        render_schedule=RenderSchedule.from_conf(
            conf.get_config("renderer", ConfigNode()), render_cfg
        ),
        train_ray_chunk=args.train_ray_chunk,
        train_remat={"true": True, "false": False}.get(
            args.train_remat, args.train_remat
        ),
        seed=args.seed,
    )
    with trace(args.profile_dir):
        trainer.start()


if __name__ == "__main__":
    main()
