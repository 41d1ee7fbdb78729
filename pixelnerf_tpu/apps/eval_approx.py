"""Fast approximate evaluation (reference eval/eval_approx.py): one random
seeded target view per object, batched over objects — the de-facto
regression test of the reference workflow.

    python -m pixelnerf_tpu.apps.eval_approx -n srn_car -D <data>/cars -P 64
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigNode
from ..data import dataset_kwargs_from_conf, get_split_dataset
from ..eval.common import FullRenderer
from ..parallel.mesh import make_mesh
from ..render.renderer import RenderConfig
from ..utils import geometry, metrics
from .args import parse_args
from .eval import load_net_and_state


def extra_args(parser):
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--source", "-P", type=str, default="64")
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--batch_size", "-B", type=int, default=4,
                        help="objects rendered per device batch "
                        "(the reference evaluates SB=4 objects at once)")
    parser.add_argument("--coarse", action="store_true",
                        help="coarse network as fine: drop the fine MLP, "
                        "keep a 64/128 hierarchy (reference "
                        "eval_approx.py:51,76-82)")
    parser.add_argument("--no_mesh", action="store_true")


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
        cfg = dataclasses.replace(cfg, n_coarse=64)
    if args.coarse:
        # reference eval_approx.py:76-82: fine MLP dropped, 64/128 hierarchy
        cfg = dataclasses.replace(cfg, n_coarse=64, n_fine=128)
    source = np.array([int(x) for x in args.source.split()])
    d0 = dset[0]
    H, W = d0["images"].shape[1:3]

    def init_fn(net):
        return net.init(
            jax.random.PRNGKey(0),
            jnp.asarray(d0["images"][None, : len(source)]),
            jnp.asarray(d0["poses"][None, : len(source)]),
            jnp.asarray(d0["focal"]), jnp.zeros((1, 8, 3)), jnp.ones((1, 8, 3)),
        )

    net, variables = load_net_and_state(args, conf, init_fn)
    if args.coarse:
        net = net.clone(mlp_fine=None)  # fine pass reuses the coarse MLP
    mesh = None
    if not args.no_mesh and jax.device_count() > 1:
        mesh = make_mesh()
    renderer = FullRenderer(net, cfg, mesh=mesh, ray_chunk=args.ray_batch_size)

    rng_np = np.random.default_rng(args.seed)
    rng = jax.random.PRNGKey(args.seed)
    total_psnr = total_ssim = 0.0
    cnt = 0
    n_objs = len(dset) if args.limit is None else min(args.limit, len(dset))

    def object_entries():
        """(data, src, target, c) per valid object, with the seeded
        per-object target choice drawn in dataset order."""
        for obj_idx in range(n_objs):
            data = dset[obj_idx]
            if not data:
                continue
            NV = data["images"].shape[0]
            src = source[source < NV]
            if len(src) == 0:
                raise SystemExit(
                    f"source view(s) {source.tolist()} out of range for "
                    f"object with {NV} views — pass e.g. -P 0 (the default "
                    "-P 64 matches the reference's 251-view SRN layout)"
                )
            if len(src) < len(source):
                print(
                    f"WARNING: dropping out-of-range source view(s) "
                    f"{sorted(set(source.tolist()) - set(src.tolist()))} "
                    f"(object has {NV} views) — conditioning on "
                    f"{len(src)} view(s), not {len(source)}"
                )
            choices = [v for v in range(NV) if v not in set(src.tolist())]
            target = int(rng_np.choice(choices))
            c_arr = data.get("c", np.array([W / 2.0, H / 2.0], np.float32))
            yield data, src, target, c_arr

    # batch SB objects per render (groups have identical shapes per batch)
    entries = list(object_entries())
    for gi in range(0, len(entries), args.batch_size):
        group = entries[gi : gi + args.batch_size]
        images = jnp.asarray(np.stack([d["images"][s] for d, s, _, _ in group]))
        poses = jnp.asarray(np.stack([d["poses"][s] for d, s, _, _ in group]))
        focal = jnp.asarray(np.stack([np.broadcast_to(
            np.atleast_1d(np.asarray(d["focal"], np.float32)), (2,)
        ) for d, _, _, _ in group]))
        c = jnp.asarray(np.stack([ca for _, _, _, ca in group]))
        enc = net.apply(variables, images, poses, focal, c=c, method=net.encode)
        rays = np.stack([
            np.asarray(geometry.gen_rays(
                jnp.asarray(d["poses"][t : t + 1]), W, H,
                jnp.asarray(d["focal"]), dset.z_near, dset.z_far,
                c=jnp.asarray(ca),
            ))[0].reshape(-1, 8)
            for d, _, t, ca in group
        ])  # (SB, H*W, 8)
        rng, key = jax.random.split(rng)
        out = renderer.render_batch(variables, enc, rays, key)
        branch = out["fine"] if cfg.using_fine else out["coarse"]
        rgbs = branch["rgb"].reshape(len(group), H, W, 3)
        for k, (d, _, t, _) in enumerate(group):
            rgb = np.clip(rgbs[k], 0, 1)
            gt = d["images"][t] * 0.5 + 0.5
            p = metrics.psnr(rgb, gt)
            s = metrics.ssim(rgb, gt, data_range=1.0)
            total_psnr += p
            total_ssim += s
            cnt += 1
            print(f"[{cnt}/{len(entries)}] psnr {p:.3f} ssim {s:.4f} "
                  f"| running {total_psnr/cnt:.3f} / {total_ssim/cnt:.4f}")
    if cnt:
        print(f"APPROX FINAL psnr {total_psnr/cnt:.4f} ssim {total_ssim/cnt:.4f}")
        return total_psnr / cnt, total_ssim / cnt


if __name__ == "__main__":
    main()
