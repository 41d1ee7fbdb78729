"""Novel-view video generation (reference eval/gen_video.py): encode source
views of one object, render an orbit (ShapeNet-style 360° spherical poses) or
a smooth spline through dataset poses (DTU-style), write mp4/gif + a
source-view strip.

    python -m pixelnerf_tpu.apps.gen_video -n sn64 -F synthetic -P "0 1" \
        --subset 0 --num_views 24
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigNode
from ..data import dataset_kwargs_from_conf, get_split_dataset
from ..eval.common import FullRenderer
from ..parallel.mesh import make_mesh
from ..render.renderer import RenderConfig
from ..utils import geometry
from .args import parse_args
from .eval import load_net_and_state


def extra_args(parser):
    parser.add_argument("--subset", "-S", type=int, default=0, help="object index")
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--source", "-P", type=str, default="64")
    parser.add_argument("--num_views", type=int, default=40)
    parser.add_argument("--elevation", type=float, default=-10.0)
    parser.add_argument("--radius", type=float, default=0.0,
                        help="orbit radius; 0 = infer from source poses")
    parser.add_argument("--scale", type=float, default=1.0)
    parser.add_argument("--fps", type=int, default=30)
    parser.add_argument("--traj", type=str, default="auto",
                        choices=["auto", "spherical", "spline", "dtu"],
                        help="auto = dtu keyframes for DTU datasets, "
                             "spherical orbit otherwise (reference behavior)")
    parser.add_argument("--output", "-O", type=str, default="video_out")
    parser.add_argument("--no_mesh", action="store_true")
    parser.add_argument("--seed", type=int, default=0)


def spherical_trajectory(num_views, elevation, radius):
    angles = np.linspace(-180, 180, num_views + 1)[:-1]
    return np.stack(
        [geometry.pose_spherical(a, elevation, radius) for a in angles]
    )


def spline_trajectory(poses, num_views):
    """Periodic cubic spline through the given camera poses (reference
    gen_video.py:120-156 DTU path, generalized to any pose set)."""
    from scipy.interpolate import CubicSpline

    import jax.numpy as _jnp

    quats = np.asarray(geometry.rot_to_quat(_jnp.asarray(poses[:, :3, :3])))
    trans = poses[:, :3, 3]
    # close the loop
    quats = np.concatenate([quats, quats[:1]], axis=0)
    trans = np.concatenate([trans, trans[:1]], axis=0)
    ts = np.arange(len(quats), dtype=np.float64)
    q_spline = CubicSpline(ts, quats, bc_type="periodic")
    t_spline = CubicSpline(ts, trans, bc_type="periodic")
    t_eval = np.linspace(0, len(quats) - 1, num_views, endpoint=False)
    q = q_spline(t_eval)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(geometry.quat_to_rot(_jnp.asarray(q.astype(np.float32))))
    out = np.tile(np.eye(4, dtype=np.float32), (num_views, 1, 1))
    out[:, :3, :3] = R
    out[:, :3, 3] = t_spline(t_eval)
    return out


# IDR's hard-coded DTU camera keyframes (pose interpolation constants from
# reference gen_video.py:120-156 — dataset-specific metadata, like viewlists)
_DTU_T_IN = np.array([0.0, 2.0, 3.0, 5.0, 6.0], dtype=np.float32)
_DTU_KEY_QUATS = np.array(
    [
        [0.9698, 0.2121, 0.1203, -0.0039],
        [0.7020, 0.1578, 0.4525, 0.5268],
        [0.6766, 0.3176, 0.5179, 0.4161],
        [0.9085, 0.4020, 0.1139, -0.0025],
        [0.9698, 0.2121, 0.1203, -0.0039],
    ],
    dtype=np.float32,
)
_DTU_SCALE = 2.0


def dtu_trajectory(num_views):
    """The reference's DTU camera path (gen_video.py:120-156): a periodic
    cubic spline through IDR's hard-coded quaternion keyframes at knots
    [0,2,3,5,6], camera center = 2.0 x the rotated +z axis.

    Matches the reference's frame-count behavior exactly: n_inter =
    num_views // 5 interpolants per knot unit, so the returned path has
    n_inter * 6 poses (the reference resets args.num_views to n_inter * 5
    but renders linspace over all 6 knot units).
    """
    from scipy.interpolate import CubicSpline

    n_inter = num_views // 5
    assert n_inter >= 1, "dtu trajectory needs num_views >= 5"
    t_out = np.linspace(
        _DTU_T_IN[0], _DTU_T_IN[-1], n_inter * int(_DTU_T_IN[-1])
    ).astype(np.float32)
    q = CubicSpline(_DTU_T_IN, _DTU_KEY_QUATS, bc_type="periodic")(t_out)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(geometry.quat_to_rot(jnp.asarray(q.astype(np.float32))))
    out = np.tile(np.eye(4, dtype=np.float32), (len(t_out), 1, 1))
    out[:, :3, :3] = R
    out[:, :3, 3] = R[:, :, 2] * _DTU_SCALE
    return out


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
    # the reference forces a reasonable minimum sampling density for video
    if cfg.n_coarse < 64:
        cfg = type(cfg)(**{**cfg.__dict__, "n_coarse": 64, "n_fine": max(cfg.n_fine, 32),
                           "n_fine_depth": cfg.n_fine_depth})

    data = dset[args.subset]
    images, poses = data["images"], data["poses"]
    NV, H, W, _ = images.shape
    source = np.array([int(x) for x in args.source.split()])
    source = source[source < NV]
    assert len(source) > 0, "no valid source views"

    def init_fn(net):
        return net.init(
            jax.random.PRNGKey(0), jnp.asarray(images[None, source]),
            jnp.asarray(poses[None, source]), jnp.asarray(data["focal"]),
            jnp.zeros((1, 8, 3)), jnp.ones((1, 8, 3)),
        )

    net, variables = load_net_and_state(args, conf, init_fn)
    mesh = None
    if not args.no_mesh and jax.device_count() > 1:
        mesh = make_mesh()
    renderer = FullRenderer(net, cfg, mesh=mesh, ray_chunk=args.ray_batch_size)

    traj = args.traj
    if traj == "auto":
        # the reference picks the DTU keyframe path whenever the dataset is
        # DVR sub_format "dtu", spherical otherwise (gen_video.py:119-121)
        traj = "dtu" if getattr(dset, "sub_format", None) == "dtu" else "spherical"
    if traj == "spherical":
        radius = args.radius or float(
            np.linalg.norm(poses[:, :3, 3], axis=-1).mean()
        ) * args.scale
        render_poses = spherical_trajectory(args.num_views, args.elevation, radius)
    elif traj == "dtu":
        render_poses = dtu_trajectory(args.num_views)
    else:
        render_poses = spline_trajectory(poses, args.num_views)

    c_arr = data.get("c", np.array([W / 2.0, H / 2.0], np.float32))
    enc = net.apply(
        variables, jnp.asarray(images[None, source]),
        jnp.asarray(poses[None, source]), jnp.asarray(data["focal"]),
        c=jnp.asarray(c_arr[None]), method=net.encode,
    )
    rays = np.asarray(
        geometry.gen_rays(
            jnp.asarray(render_poses), W, H, jnp.asarray(data["focal"]),
            dset.z_near, dset.z_far, c=jnp.asarray(c_arr),
        )
    )

    rng = jax.random.PRNGKey(args.seed)
    frames = []
    n_frames = len(render_poses)  # dtu path yields (num_views//5)*6 frames
    for i in range(n_frames):
        rng, key = jax.random.split(rng)
        rgb, _ = renderer.render_image(variables, enc, rays[i], key)
        frames.append((np.clip(rgb, 0, 1) * 255).astype(np.uint8))
        print(f"frame {i+1}/{n_frames}")

    os.makedirs(args.output, exist_ok=True)
    import imageio.v2 as imageio

    name = f"{args.name}_obj{args.subset}"
    strip = np.concatenate(
        [((images[s] * 0.5 + 0.5) * 255).astype(np.uint8) for s in source], axis=1
    )
    imageio.imwrite(os.path.join(args.output, f"{name}_src.png"), strip)
    try:
        imageio.mimwrite(
            os.path.join(args.output, f"{name}.mp4"), frames, fps=args.fps, quality=8
        )
        print("Wrote", os.path.join(args.output, f"{name}.mp4"))
    except Exception as e:
        gif = os.path.join(args.output, f"{name}.gif")
        imageio.mimwrite(gif, frames, duration=1000 / args.fps)
        print(f"mp4 unavailable ({e}); wrote {gif}")
    return frames


if __name__ == "__main__":
    main()
