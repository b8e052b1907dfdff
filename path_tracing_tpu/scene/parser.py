"""Text scene-format parser (the ``E/V/F/R/M/S/T/G/L`` grammar).

Replaces the two duplicated inline parse loops of the reference
(``src/main.cpp:106-188`` and ``src/main_cli.cpp:84-141``) with one module.
The grammar (SURVEY.md appendix):

    E  x y z                                   camera eye
    V  lx ly lz  ux uy uz                      look_at + view_up
    F  fov_deg                                 field of view
    R  W H                                     resolution
    M  r g b  roughness metallic eta           current material (PBR)
    K  ksr ksg ksb refract                     legacy Ks/refract (extension)
    S  cx cy cz  radius                        sphere
    T  x0 y0 z0  x1 y1 z1  x2 y2 z2            triangle
    G  id                                      current group id
    L  px py pz  dx dy dz  ir ig ib  cutoff_deg  is_parallel  ball_r
    // ...                                     comment to end of line

Tolerance parity: the reference's ``while(input >> t)`` loop swallows stray
tokens one character at a time (SURVEY.md quirk 9 — ``mis_test.txt`` ``M``
lines carry 9 numbers and the extra 3 are silently eaten).  We reproduce
that by skipping any token that is not a recognized single-letter record
tag.  ``cutoff`` is converted to radians at parse time (main.cpp:182).

``K`` is an extension record: the reference carries RGB shadow-transmittance
machinery (``check_visibility`` multiplies ``mtl_old.Ks`` through refractive
occluders, geometric.cuh:293-325) but never populates ``Material_Old`` —
``to_cmtl_old`` is dead code, so the fields stay zero and every occluder
blocks fully (SURVEY.md quirk 12).  ``K ksr ksg ksb refract`` sets the legacy
tail of the *current* material (an ``M`` record resets it), activating that
dormant capability; files using it still load in the reference, whose parser
skips unknown tags.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np

from .types import Material, Scene, scene_from_numpy

_TAGS = set("EVFRMKSTGL")


@dataclass
class ParsedScene:
    """Host-side parse result (numpy); `.to_device()` builds the JAX Scene."""

    eye: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    look_at: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    view_up: np.ndarray = field(default_factory=lambda: np.array([0, 1, 0], np.float32))
    fov: float = 50.0
    width: int = 0
    height: int = 0
    sph_center: List = field(default_factory=list)
    sph_radius: List = field(default_factory=list)
    sph_mtl: List = field(default_factory=list)       # rows [r,g,b,rough,metal,eta]
    sph_group: List = field(default_factory=list)
    tri_verts: List = field(default_factory=list)     # rows of 3 vertices
    tri_mtl: List = field(default_factory=list)
    tri_group: List = field(default_factory=list)
    lights: List = field(default_factory=list)        # rows [pos3,dir3,illum3,cutoff,is_par,ball_r]
    # textures (OBJ map_Kd; empty for text scenes): per-triangle vertex UVs
    # [u0,v0,u1,v1,u2,v2], per-triangle texture index (-1 = untextured), and
    # the decoded images (H, W, 3) float32 in [0, 1]
    tri_uv: List = field(default_factory=list)
    tri_tex: List = field(default_factory=list)
    textures: List = field(default_factory=list)
    # legacy shadow-transmittance materials, rows [ksr, ksg, ksb, refract]
    # per object ('K' extension record; all-zero = reference-reachable state)
    sph_legacy: List = field(default_factory=list)
    tri_legacy: List = field(default_factory=list)

    def to_device(self, cluster_leaf_size: int | None = None) -> Scene:
        import jax.numpy as jnp

        def mtl_of(rows):
            a = np.asarray(rows, np.float32).reshape(-1, 6)
            return Material(
                base_color=jnp.asarray(a[:, 0:3]),
                roughness=jnp.asarray(a[:, 3]),
                metallic=jnp.asarray(a[:, 4]),
                eta=jnp.asarray(a[:, 5]),
            )

        lights = np.asarray(self.lights, np.float32).reshape(-1, 12)

        # pad all textures into one (NT, TH+1, TW+1, 3) atlas with a
        # one-texel wrapped border (row h = row 0, col w = col 0): the
        # bilinear sampler then fetches each ray's whole 2x2 footprint
        # with ONE lax.gather instead of four independent taps (measured
        # 169 -> 71 ms per 2.07M-ray wavefront), with exact wrap
        # semantics at the seam (ops/texture.py)
        tex_atlas = tex_size = None
        if self.textures:
            th = max(t.shape[0] for t in self.textures) + 1
            tw = max(t.shape[1] for t in self.textures) + 1
            tex_atlas = np.zeros((len(self.textures), th, tw, 3), np.float32)
            tex_size = np.zeros((len(self.textures), 2), np.int32)
            for i, t in enumerate(self.textures):
                h, w = t.shape[0], t.shape[1]
                tex_atlas[i, :h, :w] = t
                tex_atlas[i, h, :w] = t[0]
                tex_atlas[i, :h, w] = t[:, 0]
                tex_atlas[i, h, w] = t[0, 0]
                tex_size[i] = (h, w)

        # fields may be lists (Python parsers) or ndarrays (the native C++
        # parser's vectorized conversion) — np.asarray + len() handle both
        tv = np.asarray(self.tri_verts, np.float32).reshape(-1, 3, 3)
        return scene_from_numpy(
            sph_center=np.asarray(self.sph_center, np.float32).reshape(-1, 3),
            sph_radius=np.asarray(self.sph_radius, np.float32),
            sph_mtl=mtl_of(self.sph_mtl),
            tri_v0=tv[:, 0],
            tri_v1=tv[:, 1],
            tri_v2=tv[:, 2],
            tri_mtl=mtl_of(self.tri_mtl),
            light_pos=lights[:, 0:3],
            light_dir=lights[:, 3:6],
            light_illum=lights[:, 6:9],
            light_cutoff=lights[:, 9],
            light_is_parallel=lights[:, 10].astype(np.int32),
            light_ball_r=lights[:, 11],
            cluster_leaf_size=cluster_leaf_size,
            tri_uv=(np.asarray(self.tri_uv, np.float32).reshape(-1, 6)
                    if len(self.tri_uv) else None),
            tri_tex=(np.asarray(self.tri_tex, np.int32)
                     if len(self.tri_tex) else None),
            tex_atlas=tex_atlas,
            tex_size=tex_size,
            sph_legacy=(np.asarray(self.sph_legacy, np.float32).reshape(-1, 4)
                        if len(self.sph_legacy) else None),
            tri_legacy=(np.asarray(self.tri_legacy, np.float32).reshape(-1, 4)
                        if len(self.tri_legacy) else None),
        )


def _tokenize(text: str) -> List[str]:
    tokens: List[str] = []
    for line in text.splitlines():
        cut = line.find("//")
        if cut >= 0:
            line = line[:cut]
        tokens.extend(line.split())
    return tokens


def parse_scene_text(text: str) -> ParsedScene:
    out = ParsedScene()
    toks = _tokenize(text)
    i = 0
    n = len(toks)
    mtl = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    legacy = [0.0, 0.0, 0.0, 0.0]  # [ks3, refract] of the current material
    group_id = 0

    def take(k: int) -> List[float]:
        nonlocal i
        vals = [float(toks[i + j]) for j in range(k)]
        i += k
        return vals

    while i < n:
        t = toks[i]
        i += 1
        if t not in _TAGS:
            continue  # stray token tolerance (quirk 9)
        try:
            if t == "E":
                out.eye = np.array(take(3), np.float32)
            elif t == "V":
                v = take(6)
                out.look_at = np.array(v[0:3], np.float32)
                out.view_up = np.array(v[3:6], np.float32)
            elif t == "F":
                out.fov = take(1)[0]
            elif t == "R":
                v = take(2)
                out.width, out.height = int(v[0]), int(v[1])
            elif t == "M":
                mtl = take(6)
                legacy = [0.0, 0.0, 0.0, 0.0]  # new material: clean tail
            elif t == "K":
                legacy = take(4)
            elif t == "S":
                v = take(4)
                out.sph_center.append(v[0:3])
                out.sph_radius.append(v[3])
                out.sph_mtl.append(list(mtl))
                out.sph_legacy.append(list(legacy))
                out.sph_group.append(group_id)
            elif t == "T":
                v = take(9)
                out.tri_verts.append([v[0:3], v[3:6], v[6:9]])
                out.tri_mtl.append(list(mtl))
                out.tri_legacy.append(list(legacy))
                out.tri_group.append(group_id)
            elif t == "G":
                group_id = int(float(toks[i])); i += 1
            elif t == "L":
                v = take(12)
                v[9] = math.radians(v[9])  # cutoff deg -> rad (main.cpp:182)
                out.lights.append(v)
        except (ValueError, IndexError):
            # A tag followed by non-numeric garbage: the reference's stream
            # parse would fail-and-stall; we skip the tag and resync.
            continue
    return out


def load_scene(path: str) -> ParsedScene:
    with open(path, "r") as f:
        return parse_scene_text(f.read())
