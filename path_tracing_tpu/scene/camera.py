"""Pinhole camera basis construction.

Equivalent of ``init_camera`` (main_cli.cpp:25-40 / main.cpp:42-57) and the
CPU oracle's inline version (cpu_bdpt.cpp:190-199).

Quirk 7 (SURVEY.md): both reference front-ends parse ``F`` from the scene but
override it with a hard-coded 50; the CPU oracle honors the file.  We honor
the file by default; pass ``force_fov=50.0`` for strict front-end parity
(identical for both shipped scenes, which say ``F 50``).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .types import Camera


def make_camera(eye, look_at, view_up, fov_deg: float, width: int, height: int,
                force_fov: float | None = None) -> Camera:
    eye = np.asarray(eye, np.float32)
    look_at = np.asarray(look_at, np.float32)
    view_up = np.asarray(view_up, np.float32)
    fov = float(force_fov) if force_fov is not None else float(fov_deg)

    aspect = width / height
    theta = fov * math.pi / 180.0
    half_height = math.tan(theta / 2.0)
    half_width = aspect * half_height

    w = eye - look_at
    w = w / np.linalg.norm(w)
    u = np.cross(view_up, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)

    ul = eye - half_width * u + half_height * v - w
    dx = (2.0 * half_width * u) / width
    dy = (-2.0 * half_height * v) / height
    return Camera(eye=jnp.asarray(eye), ul=jnp.asarray(ul.astype(np.float32)),
                  dx=jnp.asarray(dx.astype(np.float32)),
                  dy=jnp.asarray(dy.astype(np.float32)))


def primary_ray_dirs(cam: Camera, px: jnp.ndarray, py: jnp.ndarray,
                     jx: jnp.ndarray, jy: jnp.ndarray) -> jnp.ndarray:
    """Jittered primary ray directions for pixel centers (pt_cu.cu:37-41)."""
    pixel = (cam.ul[None, :]
             + cam.dx[None, :] * (px.astype(jnp.float32) + jx)[:, None]
             + cam.dy[None, :] * (py.astype(jnp.float32) + jy)[:, None])
    d = pixel - cam.eye[None, :]
    return d / jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
