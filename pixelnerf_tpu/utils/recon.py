"""Mesh extraction from a trained field (reference src/util/recon.py).

Evaluates sigma on a chunked 3-D grid, then extracts an isosurface via
marching cubes — using PyMCubes when installed, otherwise a built-in
(slower, numpy) marching-cubes fallback so the capability works in the base
image. Vertex colors come from querying the field at the vertices.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def eval_sigma_grid(
    query_fn,
    reso: Tuple[int, int, int] = (128, 128, 128),
    bounds: Tuple[float, float] = (-1.0, 1.0),
    chunk: int = 65536,
    coarse: bool = True,
) -> np.ndarray:
    """Evaluate sigma over a regular grid. query_fn(xyz (1,B,3), viewdirs,
    coarse) -> (1,B,4). Note viewdirs are faked (zeros) — as in the
    reference, results are approximate for view-dependent models
    (recon.py:38-41)."""
    xs = np.linspace(bounds[0], bounds[1], reso[0], dtype=np.float32)
    ys = np.linspace(bounds[0], bounds[1], reso[1], dtype=np.float32)
    zs = np.linspace(bounds[0], bounds[1], reso[2], dtype=np.float32)
    grid = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1).reshape(-1, 3)

    sigmas = []
    for i in range(0, grid.shape[0], chunk):
        pts = grid[i : i + chunk]
        n = pts.shape[0]
        if n < chunk:
            pts = np.concatenate([pts, np.zeros((chunk - n, 3), np.float32)])
        out = query_fn(
            jnp.asarray(pts[None]), jnp.zeros((1, chunk, 3)), coarse
        )
        sigmas.append(np.asarray(out[0, :n, 3]))
    return np.concatenate(sigmas).reshape(reso)


def marching_cubes_np(volume: np.ndarray, level: float):
    """Minimal marching-cubes via midpoint surface nets (fallback when
    PyMCubes is unavailable): emits a quad-ish triangle soup on sign
    changes. Adequate for previews; install PyMCubes for exact MC."""
    v = volume > level
    verts = []
    faces = []
    # surface nets: one vertex per boundary cell, quads across sign-change faces
    idx = -np.ones(v.shape, dtype=np.int64)
    boundary = np.zeros(v.shape, dtype=bool)
    for axis in range(3):
        sl_a = [slice(None)] * 3
        sl_b = [slice(None)] * 3
        sl_a[axis] = slice(0, -1)
        sl_b[axis] = slice(1, None)
        diff = v[tuple(sl_a)] != v[tuple(sl_b)]
        boundary[tuple(sl_a)] |= diff
        boundary[tuple(sl_b)] |= diff
    coords = np.argwhere(boundary)
    for n, c in enumerate(coords):
        idx[tuple(c)] = n
        verts.append(c.astype(np.float32))
    verts = np.asarray(verts, dtype=np.float32) if verts else np.zeros((0, 3), np.float32)

    def cell(x, y, z):
        return idx[x, y, z]

    X, Y, Z = v.shape
    for axis in range(3):
        for c in coords:
            x, y, z = c
            n = [x, y, z]
            n[axis] += 1
            if n[0] >= X or n[1] >= Y or n[2] >= Z:
                continue
            if v[x, y, z] == v[tuple(n)]:
                continue
            a1, a2 = (axis + 1) % 3, (axis + 2) % 3
            quad = []
            ok = True
            for da, db in ((0, 0), (1, 0), (1, 1), (0, 1)):
                q = [x, y, z]
                q[a1] -= da
                q[a2] -= db
                if min(q) < 0:
                    ok = False
                    break
                vid = cell(*q)
                if vid < 0:
                    ok = False
                    break
                quad.append(vid)
            if ok:
                faces.append([quad[0], quad[1], quad[2]])
                faces.append([quad[0], quad[2], quad[3]])
    faces = np.asarray(faces, dtype=np.int64) if faces else np.zeros((0, 3), np.int64)
    return verts, faces


def marching_cubes(
    query_fn,
    reso=(128, 128, 128),
    bounds=(-1.0, 1.0),
    isosurface: float = 50.0,
    chunk: int = 65536,
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract (vertices in world coords, triangles) at the given sigma level."""
    sigma = eval_sigma_grid(query_fn, reso, bounds, chunk)
    try:
        import mcubes  # optional

        verts, faces = mcubes.marching_cubes(sigma, isosurface)
    except ImportError:
        verts, faces = marching_cubes_np(sigma, isosurface)
    scale = (bounds[1] - bounds[0]) / (np.asarray(reso) - 1)
    verts = verts * scale + bounds[0]
    return verts.astype(np.float32), faces


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray,
             colors: Optional[np.ndarray] = None) -> None:
    """Write a Wavefront OBJ (with per-vertex colors if given)."""
    with open(path, "w") as f:
        for i, v in enumerate(verts):
            if colors is not None:
                c = colors[i]
                f.write(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
            else:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for tri in faces:
            f.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")
