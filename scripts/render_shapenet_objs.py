"""Renderer for real ShapeNet OBJ meshes (multi-object dataset).

Two backends, same on-disk contract:

* ``--backend blender`` — bpy engines (eevee/cycles), run under
  ``blender --background --python``; full shading quality. bpy is not
  installed in the TPU build image, so this path needs a Blender install.
* ``--backend software`` — the built-in numpy z-buffer rasterizer
  (``pixelnerf_tpu.utils.mesh_raster``): flat-Lambertian + .mtl diffuse
  colors, no external dependency, runs and is tested in-env
  (tests/test_mesh_raster.py). Use it to build real-geometry datasets
  where Blender is unavailable.

The contract matches `scripts/make_multi_obj_dataset.py` (which generates
the same layout from an analytic sphere tracer):

    <out>/<scene>/view_XXX_obj.png   RGBA object pass (film transparent)
    <out>/<scene>/view_XXX_depth.exr optional depth pass
    <out>/<scene>/view_XXX_alpha.png optional alpha pass
    <out>/<scene>/transforms.json    {frames:[{transform_matrix,file_path}],
                                      model_ids, camera_angle_x}
    <src>/{train,val,test}_split_N.txt

Behavioral contract follows the reference renderer
(/root/reference/scripts/render_shapenet.py): OBJ import with -Z forward /
Y up, meshes joined, a random z-rotation, scaled so the bbox diameter is
~2 units and resting on z=0 (:35-81); 1 object centered with camera
distance 4, or 2 objects moved to opposite quadrants with distance 6
(:287-325); views parameterized as (pitch, yaw) eulers on a TRACK_TO empty
at the look-at point — train uses binned-uniform hemisphere yaws with
jitter, val/test the SRN Archimedes spiral (:492-501); compositor file
outputs for the passes (:399-441); transforms.json with the camera's world
matrix written AFTER each render (:507-522).

Usage (Blender 2.9x/3.x):
    blender --background --python scripts/render_shapenet_objs.py -- \
        --src <shapenet_category_dir> --out <dataset_dir> \
        --n_scenes 100 --n_objects 2 --n_views 50 --split train

The view-direction math is pure python (testable without bpy); everything
touching bpy is kept behind `main()`.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

PITCH_MAX_DEG = 80.0


def view_eulers(split: str, n_views: int, rng: np.ndarray):
    """(pitch, yaw) per view, radians — reference render_shapenet.py:492-501.

    train: yaw = 6*pi*i/N + U(0, pi/N) (binned uniform around the
    hemisphere), pitch ~ U(0, 80 deg). val/test: the SRN Archimedes spiral —
    pitch climbs linearly 0..80 deg while yaw wraps 3 full turns.
    """
    pitch_range = (0.0, math.radians(PITCH_MAX_DEG))
    yaws = 6.0 * np.pi * np.arange(n_views) / n_views
    if split == "train":
        pitches = rng.uniform(*pitch_range, size=(n_views,))
        yaws = yaws + rng.uniform(0.0, np.pi / n_views, size=(n_views,))
    else:
        pitches = (
            np.arange(n_views) / n_views * (pitch_range[1] - pitch_range[0])
        )
    return pitches, yaws


def split_scenes(model_dirs, val_frac: float, test_frac: float, rng):
    """Deterministic train/val/test partition of model directories."""
    models = sorted(model_dirs)
    order = rng.permutation(len(models))
    n_val = int(val_frac * len(models))
    n_test = int(test_frac * len(models))
    val = [models[i] for i in order[:n_val]]
    test = [models[i] for i in order[n_val : n_val + n_test]]
    train = [models[i] for i in order[n_val + n_test :]]
    return train, val, test


def write_split_files(src_dir, train, val, test):
    for name, models in (("train", train), ("val", val), ("test", test)):
        path = os.path.join(src_dir, f"{name}_split_{len(models)}.txt")
        with open(path, "w") as f:
            f.write("\n".join(os.path.basename(m) for m in models) + "\n")
        print(f"wrote {path}")


# --------------------------------------------------------------------------
# Everything below requires bpy (runs only inside Blender).
# --------------------------------------------------------------------------


def _parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="ShapeNet category dir of OBJ model dirs")
    p.add_argument("--out", required=True, help="output dataset dir")
    p.add_argument("--model_path", default="models/model_normalized.obj")
    p.add_argument("--split", default="train", choices=["train", "val", "test"])
    p.add_argument("--n_scenes", type=int, default=100)
    p.add_argument("--n_objects", type=int, default=2, choices=[1, 2])
    p.add_argument("--n_views", type=int, default=50)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--val_frac", type=float, default=0.1)
    p.add_argument("--test_frac", type=float, default=0.1)
    p.add_argument(
        "--backend", default="blender", choices=["blender", "software"],
        help="'blender' = bpy engines (run under `blender --background "
        "--python ...`); 'software' = the built-in numpy z-buffer "
        "rasterizer (no Blender needed; flat Lambertian + .mtl Kd colors)",
    )
    p.add_argument("--engine", default="eevee", choices=["eevee", "cycles"])
    p.add_argument("--n_samples", type=int, default=64, help="cycles samples")
    p.add_argument("--light_env", default=None, help="HDRI path (cycles)")
    p.add_argument("--render_depth", action="store_true")
    p.add_argument("--render_alpha", action="store_true")
    p.add_argument("--overwrite", action="store_true")
    return p.parse_args(argv)


def _import_normalized(bpy, model_dir, model_path, rng):
    """Import an OBJ, join meshes, random z-spin, diameter ~2, rest on z=0."""

    for o in bpy.data.objects:
        o.select_set(False)
    bpy.ops.import_scene.obj(
        filepath=os.path.join(model_dir, model_path),
        axis_forward="-Z",
        axis_up="Y",
    )
    sel = bpy.context.selected_objects
    if len(sel) > 1:
        ctx = bpy.context.copy()
        ctx["active_object"] = sel[0]
        ctx["selected_editable_objects"] = sel
        bpy.ops.object.join(ctx)
    obj = sel[0]
    obj.rotation_euler[2] = rng.uniform(0.0, 2.0 * np.pi)

    def world_bbox():
        # matrix_world is stale until the depsgraph re-evaluates, and the
        # bbox of a rotated mesh is the bbox of its *transformed* vertices
        # (transforming the two local min/max corners is wrong under
        # rotation) — so update, then transform every vertex
        bpy.context.view_layer.update()
        m = np.array(obj.matrix_world)
        verts = np.array([v.co[:] for v in obj.data.vertices])
        world = verts @ m[:3, :3].T + m[:3, 3]
        return world.min(axis=0), world.max(axis=0)

    lo, hi = world_bbox()
    scale = 2.0 / float((hi - lo).max())
    obj.scale = (scale, scale, scale)
    lo, hi = world_bbox()              # recompute with the scale applied
    obj.location[2] -= lo[2]
    shift = np.array([0.0, 0.0, lo[2]])
    return obj, (lo - shift, hi - shift)


def _place_and_camera(bpy, objs, bbs):
    """Center 1 object / spread 2 into opposite quadrants; tracked camera."""
    from mathutils import Vector

    lookat = Vector((0.0, 0.0, 0.0))
    if len(objs) == 1:
        objs[0].location[0] = objs[0].location[1] = 0.0
        lookat = objs[0].location
        cam_loc = Vector((0.0, 4.0, lookat[2]))
    else:
        sign = -1.0
        for obj, (lo, _hi) in zip(objs, bbs):
            obj.location[0] = sign * lo[0]
            obj.location[1] = sign * lo[1]
            sign *= -1.0
            lookat = lookat + obj.location
        lookat = lookat / len(objs)
        cam_loc = Vector((0.0, 6.0, lookat[2]))

    bpy.ops.object.camera_add()
    cam = bpy.context.active_object
    bpy.context.scene.camera = cam
    cam.location = cam_loc + lookat

    track_to = bpy.data.objects.new("LookAt", None)
    track_to.location = lookat
    bpy.context.scene.collection.objects.link(track_to)
    constraint = cam.constraints.new(type="TRACK_TO")
    constraint.track_axis = "TRACK_NEGATIVE_Z"
    constraint.up_axis = "UP_Y"
    constraint.target = track_to
    cam.parent = track_to
    bpy.context.view_layer.update()
    return cam, track_to


def _setup_engine(bpy, args):
    scene = bpy.context.scene
    scene.render.resolution_x = scene.render.resolution_y = args.size
    scene.render.film_transparent = True
    scene.use_nodes = True
    if args.engine == "cycles":
        scene.render.engine = "CYCLES"
        scene.cycles.samples = args.n_samples
        if args.light_env:
            world = scene.world
            world.use_nodes = True
            nodes, links = world.node_tree.nodes, world.node_tree.links
            bg = nodes.new("ShaderNodeBackground")
            env = nodes.new("ShaderNodeTexEnvironment")
            env.image = bpy.data.images.load(args.light_env, check_existing=True)
            links.new(env.outputs["Color"], bg.inputs["Color"])
            links.new(bg.outputs["Background"], nodes["World Output"].inputs["Surface"])
    else:
        scene.render.engine = "BLENDER_EEVEE"
        for loc in ((2, -2, 4), (-2, 2, 4), (0, 3, 2)):
            bpy.ops.object.light_add(type="SUN", location=loc)

    tree = scene.node_tree
    rl = tree.nodes["Render Layers"]
    out_obj = tree.nodes.new("CompositorNodeOutputFile")
    out_obj.name = "ObjOut"
    out_obj.format.color_mode = "RGBA"
    tree.links.new(rl.outputs["Image"], out_obj.inputs["Image"])
    if args.render_alpha:
        out_a = tree.nodes.new("CompositorNodeOutputFile")
        out_a.name = "AlphaOut"
        tree.links.new(rl.outputs["Alpha"], out_a.inputs["Image"])
    if args.render_depth:
        bpy.context.view_layer.use_pass_z = True
        out_d = tree.nodes.new("CompositorNodeOutputFile")
        out_d.name = "DepthOut"
        out_d.format.file_format = "OPEN_EXR"
        out_d.format.color_depth = "32"
        tree.links.new(rl.outputs["Depth"], out_d.inputs["Image"])


def _render_view(bpy, scene_dir, view_idx, args):
    """Point the file-output nodes at view_{i:03d}_<pass> and render."""
    import glob
    import shutil

    tree = bpy.context.scene.node_tree
    stem = f"view_{view_idx:03d}"
    outputs = [("ObjOut", "obj", None)]
    if args.render_alpha:
        outputs.append(("AlphaOut", "alpha", None))
    if args.render_depth:
        outputs.append(("DepthOut", "depth", None))
    for node_name, suffix, _ in outputs:
        node = tree.nodes[node_name]
        node.base_path = scene_dir
        node.file_slots[0].path = f"{stem}_{suffix}_"
    bpy.context.scene.render.filepath = os.path.join(scene_dir, ".composite")
    bpy.ops.render.render(write_still=True)
    # blender appends frame numbers; strip them to the contract's names
    for _node_name, suffix, _ in outputs:
        matches = glob.glob(os.path.join(scene_dir, f"{stem}_{suffix}_*"))
        assert len(matches) == 1, matches
        ext = os.path.splitext(matches[0])[1]
        shutil.move(matches[0], os.path.join(scene_dir, f"{stem}_{suffix}{ext}"))
    return os.path.join(scene_dir, stem)


def _delete_all(bpy, names):
    for obj in bpy.data.objects:
        obj.select_set(obj.name in names)
    bpy.ops.object.delete()
    for coll in (bpy.data.meshes, bpy.data.materials, bpy.data.images):
        for block in coll:
            if block.users == 0:
                coll.remove(block)


# --------------------------------------------------------------------------
# Software backend (no Blender): numpy z-buffer rasterizer
# --------------------------------------------------------------------------

# Blender's default camera: 50mm focal length on a 36mm sensor
BLENDER_DEFAULT_ANGLE_X = 2.0 * math.atan(36.0 / (2.0 * 50.0))


def software_main(args):
    """Render the same dataset contract with ``utils.mesh_raster`` instead of
    bpy: OBJ import normalization (z-spin, diameter ~2, rest on z=0),
    quadrant placement, tracked orbit camera from the shared
    ``view_eulers``, RGBA object pass + optional depth/alpha passes,
    transforms.json. Semantics follow the reference renderer
    (render_shapenet.py:35-81,287-325,399-441,507-522); the imaging model is
    flat-shaded rasterization rather than a Blender engine."""
    import imageio.v2 as imageio

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pixelnerf_tpu.utils.geometry import look_at
    from pixelnerf_tpu.utils.mesh_raster import (
        load_obj,
        normalize_mesh,
        rasterize,
    )

    rng = np.random.default_rng(args.seed)
    model_dirs = [
        os.path.join(args.src, d)
        for d in sorted(os.listdir(args.src))
        if os.path.isdir(os.path.join(args.src, d))
    ]
    train, val, test = split_scenes(model_dirs, args.val_frac, args.test_frac, rng)
    write_split_files(args.src, train, val, test)
    pool = {"train": train, "val": val, "test": test}[args.split]
    if not pool:
        raise SystemExit(
            f"the {args.split} split is empty ({len(model_dirs)} models, "
            f"val_frac={args.val_frac}, test_frac={args.test_frac}) — add "
            "models or adjust the fractions"
        )

    H = W = args.size
    angle_x = BLENDER_DEFAULT_ANGLE_X
    focal = 0.5 * W / math.tan(0.5 * angle_x)

    for scene_i in range(args.n_scenes):
        picks = [pool[int(i)] for i in rng.integers(0, len(pool), args.n_objects)]
        scene_name = "_".join(os.path.basename(p) for p in picks)[:80]
        scene_dir = os.path.join(args.out, args.split, f"{scene_i:05d}_{scene_name}")
        if os.path.isdir(scene_dir) and not args.overwrite:
            print(f"skip existing {scene_dir}")
            continue
        os.makedirs(scene_dir, exist_ok=True)

        # import + normalize each pick; track each mesh's world "location"
        # (the z rest shift; x/y from quadrant placement below)
        meshes = []
        for p in picks:
            verts, faces, colors = load_obj(os.path.join(p, args.model_path))
            z_rot = rng.uniform(0.0, 2.0 * np.pi)
            verts, (lo, hi), origin = normalize_mesh(verts, z_rot)
            meshes.append({"verts": verts, "faces": faces, "colors": colors,
                           "lo": lo, "hi": hi, "origin": origin})

        # placement: 1 object centered at the origin; 2 objects shifted into
        # opposite quadrants by their own bbox minima. The camera aims at the
        # mean of the objects' ORIGINS (incl. the z rest shift ~ mid-height),
        # matching the bpy path's lookat = mean(obj.location)
        # (reference :287-325)
        locations = []
        if len(meshes) == 1:
            locations.append(meshes[0]["origin"])
            cam_dist = 4.0
        else:
            sign = -1.0
            for m in meshes:
                shift = np.array(
                    [sign * m["lo"][0], sign * m["lo"][1], 0.0], np.float32
                )
                m["verts"] = m["verts"] + shift
                locations.append(m["origin"] + shift)
                sign *= -1.0
            cam_dist = 6.0
        lookat = np.mean(np.stack(locations), axis=0)

        # merge into one soup for the rasterizer
        all_verts = np.concatenate([m["verts"] for m in meshes])
        offs = np.cumsum([0] + [m["verts"].shape[0] for m in meshes[:-1]])
        all_faces = np.concatenate(
            [m["faces"] + o for m, o in zip(meshes, offs)]
        )
        all_colors = np.concatenate([m["colors"] for m in meshes])

        pitches, yaws = view_eulers(args.split, args.n_views, rng)
        frames = []
        for i in range(args.n_views):
            # tracked orbit: offset (0, dist, 0) pitched about x then spun
            # about z (the bpy TRACK_TO empty's XYZ euler), z-up world
            cp, sp = math.cos(pitches[i]), math.sin(pitches[i])
            cy, sy = math.cos(yaws[i]), math.sin(yaws[i])
            off = np.array(
                [-sy * cp * cam_dist, cy * cp * cam_dist, sp * cam_dist],
                np.float32,
            )
            pose = look_at(lookat + off, lookat, world_up=(0.0, 0.0, 1.0))
            rgb, depth, alpha = rasterize(
                all_verts, all_faces, all_colors, pose, H, W, focal, bg=0.0
            )
            stem = f"view_{i:03d}"
            rgba = np.concatenate(
                [
                    (np.clip(rgb, 0, 1) * 255).astype(np.uint8),
                    (alpha * 255).astype(np.uint8)[..., None],
                ],
                axis=-1,
            )
            imageio.imwrite(os.path.join(scene_dir, f"{stem}_obj.png"), rgba)
            if args.render_alpha:
                imageio.imwrite(
                    os.path.join(scene_dir, f"{stem}_alpha.png"),
                    (alpha * 255).astype(np.uint8),
                )
            if args.render_depth:
                from pixelnerf_tpu.utils.exr import write_exr

                write_exr(
                    os.path.join(scene_dir, f"{stem}_depth.exr"),
                    depth.astype(np.float32),
                )
            frames.append(
                {
                    "transform_matrix": pose.tolist(),
                    # relative per the transforms.json convention (the bpy
                    # path's absolute stem only loads because the adapter
                    # takes the basename) — keeps datasets relocatable
                    "file_path": f"./{stem}",
                }
            )
        with open(os.path.join(scene_dir, "transforms.json"), "w") as f:
            json.dump(
                {
                    "frames": frames,
                    "model_ids": [os.path.basename(p) for p in picks],
                    "camera_angle_x": angle_x,
                },
                f,
                indent=1,
            )
        print(f"rendered {scene_dir}")


def main():
    argv = sys.argv[sys.argv.index("--") + 1 :] if "--" in sys.argv else sys.argv[1:]
    args = _parse_args(argv)
    if args.backend == "software":
        software_main(args)
        return
    blender_main(args)


def blender_main(args):
    import bpy  # only available inside Blender

    rng = np.random.default_rng(args.seed)

    model_dirs = [
        os.path.join(args.src, d)
        for d in sorted(os.listdir(args.src))
        if os.path.isdir(os.path.join(args.src, d))
    ]
    train, val, test = split_scenes(model_dirs, args.val_frac, args.test_frac, rng)
    write_split_files(args.src, train, val, test)
    pool = {"train": train, "val": val, "test": test}[args.split]

    _delete_all(bpy, [o.name for o in bpy.data.objects])
    _setup_engine(bpy, args)

    for scene_i in range(args.n_scenes):
        picks = [pool[int(i)] for i in rng.integers(0, len(pool), args.n_objects)]
        scene_name = "_".join(os.path.basename(p) for p in picks)[:80]
        scene_dir = os.path.join(args.out, args.split, f"{scene_i:05d}_{scene_name}")
        if os.path.isdir(scene_dir) and not args.overwrite:
            print(f"skip existing {scene_dir}")
            continue
        os.makedirs(scene_dir, exist_ok=True)

        objs, bbs = [], []
        for p in picks:
            obj, bb = _import_normalized(bpy, p, args.model_path, rng)
            objs.append(obj)
            bbs.append(bb)
        cam, track_to = _place_and_camera(bpy, objs, bbs)

        pitches, yaws = view_eulers(args.split, args.n_views, rng)
        frames = []
        for i in range(args.n_views):
            track_to.rotation_euler = (pitches[i], 0.0, yaws[i])
            stem = _render_view(bpy, scene_dir, i, args)
            # world matrix must be read AFTER the render (lazy view layer)
            frames.append(
                {
                    "transform_matrix": np.array(cam.matrix_world).tolist(),
                    "file_path": stem,
                }
            )
        with open(os.path.join(scene_dir, "transforms.json"), "w") as f:
            json.dump(
                {
                    "frames": frames,
                    "model_ids": [os.path.basename(p) for p in picks],
                    "camera_angle_x": cam.data.angle_x,
                },
                f,
                indent=1,
            )
        _delete_all(bpy, [o.name for o in objs] + [cam.name, track_to.name])
        print(f"rendered {scene_dir}")


if __name__ == "__main__":
    main()
