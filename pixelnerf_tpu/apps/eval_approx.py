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
from ..data import get_split_dataset
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
    parser.add_argument("--no_mesh", action="store_true")


def main(argv=None):
    args, conf = parse_args(extra_args, argv=argv)
    dset = get_split_dataset(
        args.dataset_format, args.datadir, want_split=args.split, training=False
    )
    cfg = RenderConfig.from_conf(
        conf.get_config("renderer", ConfigNode()),
        lindisp=getattr(dset, "lindisp", False),
        eval_batch_size=args.ray_batch_size,
    )
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
    mesh = None
    if not args.no_mesh and jax.device_count() > 1:
        mesh = make_mesh()
    renderer = FullRenderer(net, cfg, mesh=mesh, ray_chunk=args.ray_batch_size)

    rng_np = np.random.default_rng(args.seed)
    rng = jax.random.PRNGKey(args.seed)
    total_psnr = total_ssim = 0.0
    cnt = 0
    n_objs = len(dset) if args.limit is None else min(args.limit, len(dset))
    for obj_idx in range(n_objs):
        data = dset[obj_idx]
        if not data:
            continue
        NV = data["images"].shape[0]
        src = source[source < NV]
        choices = [v for v in range(NV) if v not in set(src.tolist())]
        target = int(rng_np.choice(choices))
        c_arr = data.get("c", np.array([W / 2.0, H / 2.0], np.float32))
        enc = net.apply(
            variables, jnp.asarray(data["images"][None, src]),
            jnp.asarray(data["poses"][None, src]), jnp.asarray(data["focal"]),
            c=jnp.asarray(c_arr[None]), method=net.encode,
        )
        rays = np.asarray(
            geometry.gen_rays(
                jnp.asarray(data["poses"][target : target + 1]), W, H,
                jnp.asarray(data["focal"]), dset.z_near, dset.z_far,
                c=jnp.asarray(c_arr),
            )
        )[0]
        rng, key = jax.random.split(rng)
        rgb, _depth = renderer.render_image(variables, enc, rays, key)
        gt = data["images"][target] * 0.5 + 0.5
        p = metrics.psnr(np.clip(rgb, 0, 1), gt)
        s = metrics.ssim(np.clip(rgb, 0, 1), gt, data_range=1.0)
        total_psnr += p
        total_ssim += s
        cnt += 1
        print(f"[{obj_idx+1}/{n_objs}] psnr {p:.3f} ssim {s:.4f} "
              f"| running {total_psnr/cnt:.3f} / {total_ssim/cnt:.4f}")
    if cnt:
        print(f"APPROX FINAL psnr {total_psnr/cnt:.4f} ssim {total_ssim/cnt:.4f}")
        return total_psnr / cnt, total_ssim / cnt


if __name__ == "__main__":
    main()
