"""Synthetic benchmark scenes: subdivided icospheres at arbitrary
triangle counts, optionally with spherical UVs + a procedural checker
texture.

BASELINE config 3 ("textured OBJ mesh + full BVH, 1080p PT") needs big
clustered meshes; shipping a generator instead of multi-megabyte OBJ
fixtures keeps the repo small and makes the big-mesh / textured
benchmarks reproducible from a clean checkout (``bench.py --config 3
--gen-tris 249000 [--gen-tex]``).  The reference has no mesh scenes at
all — its tiny_obj_loader.h is vendored but never called — so there is
no reference fixture to reuse.
"""
from __future__ import annotations

import math

import numpy as np

from .obj_loader import ParsedScene, default_framing


def icosphere(n_tris: int):
    """Subdivide an icosahedron until >= ``n_tris`` faces; returns
    (vertices (V, 3) float32 on the unit sphere, faces (F, 3) int32)."""
    p = (1 + 5 ** 0.5) / 2
    v = np.array([[-1, p, 0], [1, p, 0], [-1, -p, 0], [1, -p, 0],
                  [0, -1, p], [0, 1, p], [0, -1, -p], [0, 1, -p],
                  [p, 0, -1], [p, 0, 1], [-p, 0, -1], [-p, 0, 1]], float)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                 int)

    while len(f) < n_tris:
        cache: dict = {}
        verts = list(map(tuple, v))

        def mid(a, b):
            k = (min(a, b), max(a, b))
            if k not in cache:
                m = np.asarray(verts[a]) + np.asarray(verts[b])
                m /= np.linalg.norm(m)
                cache[k] = len(verts)
                verts.append(tuple(m))
            return cache[k]

        nf = []
        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v, f = np.asarray(verts), np.asarray(nf)
    return v.astype(np.float32), f.astype(np.int32)


def checker_texture(n: int = 256, cell: int = 32):
    """(n, n, 3) float32 linear-RGB red/blue checkerboard."""
    cells = (np.indices((n, n)).sum(axis=0) // cell) % 2
    img = np.empty((n, n, 3), np.float32)
    img[cells == 0] = ((np.array([230, 60, 60]) / 255.0) ** 2.2)
    img[cells == 1] = ((np.array([60, 60, 230]) / 255.0) ** 2.2)
    return img


def icosphere_scene(n_tris: int, textured: bool = False,
                    mtl=None) -> ParsedScene:
    """A ParsedScene holding a >= ``n_tris`` icosphere with the same
    default framing/light an OBJ without a companion scene gets
    (obj_loader.default_framing); ``textured`` adds spherical UVs and the
    checker atlas.  ``mtl`` is a [r, g, b, rough, metal, eta] row
    (default: white diffuse)."""
    v, f = icosphere(n_tris)
    mtl = list(mtl) if mtl is not None else [0.75, 0.75, 0.75, 1.0, 0.0, 0.0]
    out = ParsedScene()
    out.tri_verts = [[v[a].tolist(), v[b].tolist(), v[c].tolist()]
                     for a, b, c in f]
    out.tri_mtl = [mtl] * len(f)
    out.tri_group = [0] * len(f)
    if textured:
        # spherical UVs; same convention as the OBJ path (v points up)
        u = 0.5 + np.arctan2(v[:, 2], v[:, 0]) / (2 * math.pi)
        w = 0.5 - np.arcsin(np.clip(v[:, 1], -1, 1)) / math.pi
        uv = np.stack([u, 1.0 - w], axis=1).astype(np.float32)
        out.tri_uv = [[*uv[a], *uv[b], *uv[c]] for a, b, c in f]
        out.tri_tex = [0] * len(f)
        out.textures = [checker_texture()]
    default_framing(out)
    return out
