"""Mesh extraction CLI: sigma-grid marching cubes from a trained model
(reference src/util/recon.py had the library but no CLI wiring).

    python -m pixelnerf_tpu.apps.recon -n demo -F synthetic --subset 0 \
        --reso 64 -O mesh_out
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data import dataset_kwargs_from_conf, get_split_dataset
from ..utils.recon import marching_cubes, save_obj
from .args import parse_args
from .eval import load_net_and_state


def extra_args(parser):
    parser.add_argument("--subset", "-S", type=int, default=0)
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--source", "-P", type=str, default="0")
    parser.add_argument("--reso", type=int, default=128)
    parser.add_argument("--bounds", type=float, default=1.0)
    parser.add_argument("--isosurface", type=float, default=10.0)
    parser.add_argument("--output", "-O", type=str, default="mesh_out")


def main(argv=None):
    args, conf = parse_args(extra_args, argv=argv)
    dset = get_split_dataset(
        args.dataset_format, args.datadir, want_split=args.split, training=False,
        **dataset_kwargs_from_conf(conf),
    )
    data = dset[args.subset]
    source = np.array([int(x) for x in args.source.split()])
    H, W = data["images"].shape[1:3]

    def init_fn(net):
        return net.init(
            jax.random.PRNGKey(0), jnp.asarray(data["images"][None, source]),
            jnp.asarray(data["poses"][None, source]), jnp.asarray(data["focal"]),
            jnp.zeros((1, 8, 3)), jnp.ones((1, 8, 3)),
        )

    net, variables = load_net_and_state(args, conf, init_fn)
    c_arr = data.get("c", np.array([W / 2.0, H / 2.0], np.float32))
    enc = net.apply(
        variables, jnp.asarray(data["images"][None, source]),
        jnp.asarray(data["poses"][None, source]), jnp.asarray(data["focal"]),
        c=jnp.asarray(c_arr[None]), method=net.encode,
    )

    query = jax.jit(
        lambda xyz, vd, coarse: net.apply(
            variables, enc, xyz, viewdirs=vd, coarse=coarse, method=net.query
        ),
        static_argnums=2,
    )
    print("Evaluating sigma grid...")
    verts, faces = marching_cubes(
        query,
        reso=(args.reso,) * 3,
        bounds=(-args.bounds, args.bounds),
        isosurface=args.isosurface,
    )
    print(f"{len(verts)} vertices, {len(faces)} faces")

    colors = None
    if len(verts):
        chunks = []
        chunk = 65536
        for i in range(0, len(verts), chunk):
            pts = verts[i : i + chunk]
            n = pts.shape[0]
            pad = np.zeros((chunk - n, 3), np.float32)
            out = query(
                jnp.asarray(np.concatenate([pts, pad])[None]),
                jnp.zeros((1, chunk, 3)), True,
            )
            chunks.append(np.asarray(out[0, :n, :3]))
        colors = np.concatenate(chunks)

    os.makedirs(args.output, exist_ok=True)
    out_path = os.path.join(args.output, f"{args.name}_obj{args.subset}.obj")
    save_obj(out_path, verts, faces, colors)
    print("Wrote", out_path)


if __name__ == "__main__":
    main()
