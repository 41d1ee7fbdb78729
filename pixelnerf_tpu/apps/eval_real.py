"""Real-image inference (reference eval/eval_real.py): encode a single
preprocessed `*_normalize.png` with a dummy pose and render an orbit.

Uses the SRN-car conventions: dummy camera at z = 1.3 looking at the origin,
focal 131.25 for 128x128, z in [0.8, 1.8] (reference eval_real.py:44-48,
127-143).

    python -m pixelnerf_tpu.apps.eval_real -n srn_car --input input/*_normalize.png
"""
from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigNode
from ..eval.common import FullRenderer
from ..parallel.mesh import make_mesh
from ..render.renderer import RenderConfig
from ..utils import geometry
from .args import parse_args
from .eval import load_net_and_state


def extra_args(parser):
    parser.add_argument("--input", type=str, default="input",
                        help="image file, glob, or directory of *_normalize.png")
    parser.add_argument("--output", "-O", type=str, default="real_out")
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--focal", type=float, default=131.25)
    parser.add_argument("--radius", type=float, default=1.3)
    parser.add_argument("--z_near", type=float, default=0.8)
    parser.add_argument("--z_far", type=float, default=1.8)
    parser.add_argument("--elevation", type=float, default=0.0)
    parser.add_argument("--num_views", type=int, default=24)
    parser.add_argument("--fps", type=int, default=15)
    parser.add_argument(
        "--out_size", type=str, default=None,
        help="render size, 1 or 2 numbers 'W' or 'W H' (default: --size). "
        "Reference quirk preserved: focal is NOT rescaled, so larger "
        "out_size widens the field of view (eval_real.py:88-93,110)",
    )
    parser.add_argument("--gif", action="store_true",
                        help="store gif instead of mp4")
    parser.add_argument("--no_vid", action="store_true",
                        help="skip the video; only frame PNGs are written")
    parser.add_argument("--no_mesh", action="store_true")
    parser.add_argument("--seed", type=int, default=0)


def _gather_inputs(spec: str):
    if os.path.isdir(spec):
        return sorted(glob.glob(os.path.join(spec, "*_normalize.png")))
    hits = sorted(glob.glob(spec))
    return [h for h in hits if h.lower().endswith((".png", ".jpg", ".jpeg"))]


def main(argv=None):
    args, conf = parse_args(extra_args, argv=argv)
    inputs = _gather_inputs(args.input)
    assert inputs, f"no input images matched {args.input!r}"

    cfg = RenderConfig.from_conf(
        conf.get_config("renderer", ConfigNode()),
        eval_batch_size=args.ray_batch_size,
    )
    H = W = args.size
    # render resolution (reference eval_real.py:88-93); encode stays at --size
    if args.out_size:
        sz = [int(x) for x in args.out_size.split()]
        out_w, out_h = (sz[0], sz[0]) if len(sz) == 1 else (sz[0], sz[1])
    else:
        out_w, out_h = W, H
    # dummy camera: identity rotation at z = radius (reference eval_real.py:127-129)
    cam_pose = np.eye(4, dtype=np.float32)
    cam_pose[2, 3] = args.radius

    def init_fn(net):
        return net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, H, W, 3)),
            jnp.asarray(cam_pose[None, None]), jnp.asarray(args.focal),
            jnp.zeros((1, 8, 3)), jnp.ones((1, 8, 3)),
        )

    net, variables = load_net_and_state(args, conf, init_fn)
    mesh = None
    if not args.no_mesh and jax.device_count() > 1:
        mesh = make_mesh()
    renderer = FullRenderer(net, cfg, mesh=mesh, ray_chunk=args.ray_batch_size)

    import imageio.v2 as imageio

    os.makedirs(args.output, exist_ok=True)
    # spherical orbit poses converted from blender coords
    # (reference eval_real.py:95-106)
    from_blender = geometry.coord_from_blender()
    angles = np.linspace(-180, 180, args.num_views + 1)[:-1]
    render_poses = np.stack(
        [
            from_blender @ geometry.pose_spherical(a, args.elevation, args.radius)
            for a in angles
        ]
    )

    rng = jax.random.PRNGKey(args.seed)
    for img_path in inputs:
        img = imageio.imread(img_path)[..., :3]
        if img.shape[:2] != (H, W):
            import cv2

            img = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
        image = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
        enc = net.apply(
            variables, jnp.asarray(image[None, None]),
            jnp.asarray(cam_pose[None, None]), jnp.asarray(args.focal),
            method=net.encode,
        )
        rays = np.asarray(
            geometry.gen_rays(
                jnp.asarray(render_poses), out_w, out_h,
                jnp.asarray(args.focal), args.z_near, args.z_far,
            )
        )
        frames = []
        for i in range(args.num_views):
            rng, key = jax.random.split(rng)
            rgb, _ = renderer.render_image(variables, enc, rays[i], key)
            frames.append((np.clip(rgb, 0, 1) * 255).astype(np.uint8))
        base = os.path.splitext(os.path.basename(img_path))[0]
        # frame PNGs always (reference eval_real.py:155-161)
        frames_dir = os.path.join(args.output, f"{base}_frames")
        os.makedirs(frames_dir, exist_ok=True)
        for i, frm in enumerate(frames):
            imageio.imwrite(os.path.join(frames_dir, f"{i:04}.png"), frm)
        if not args.no_vid:
            if args.gif:
                imageio.mimwrite(
                    os.path.join(args.output, f"{base}.gif"), frames,
                    duration=1000 / args.fps,
                )
            else:
                try:
                    imageio.mimwrite(
                        os.path.join(args.output, f"{base}.mp4"), frames,
                        fps=args.fps,
                    )
                except Exception:
                    imageio.mimwrite(
                        os.path.join(args.output, f"{base}.gif"), frames,
                        duration=1000 / args.fps,
                    )
        print("Rendered", base)


if __name__ == "__main__":
    main()
