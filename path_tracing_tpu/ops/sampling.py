"""Light-emission and direction sampling used by all integrators.

Batched equivalents of the emission sampling the reference duplicates in
``bdpt_cu.cu:39-89``, ``ppm_cu.cu:177-210`` and ``cpu_bdpt.cpp:227-254``
(one implementation here, shared by BDPT, PPM and the oracle), plus the
uniform-sphere-surface sampler that replaces the rejection loop of
``random_in_unit_sphere_device`` (geometric.cuh:407-414) — rejection loops
are not expressible as fixed-shape programs, and uniform-on-surface is the
exact distribution the NEE code uses after normalization (pt_cu.cu:151-155).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .math3 import PI, cross, normalize


def uniform_sphere_dir(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Uniform direction on the unit sphere from two uniforms."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def cosine_hemisphere_dir(n: jnp.ndarray, u1: jnp.ndarray,
                          u2: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere around ``n``. geometric.cuh:391-404."""
    z_axis = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape)
    y_axis = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape)
    use_z = (jnp.abs(n[..., 2]) < 0.999)[..., None]
    t = normalize(jnp.where(use_z, cross(z_axis, n), cross(y_axis, n)))
    b = cross(n, t)
    r = jnp.sqrt(u1)
    phi = 2.0 * PI * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    return normalize(t * x[..., None] + b * y[..., None] + n * z[..., None])


def _light_frame(w: jnp.ndarray):
    """The reference's ad-hoc frame around a light direction.

    bdpt_cu.cu:47-52 / :69-74: pick u = +y if |w.x|>0.9 else +x, then
    v = normalize(w x u), u = normalize(v x w).
    """
    y_axis = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], w.dtype), w.shape)
    x_axis = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], w.dtype), w.shape)
    u0 = jnp.where((jnp.abs(w[..., 0]) > 0.9)[..., None], y_axis, x_axis)
    v = normalize(cross(w, u0))
    u = normalize(cross(v, w))
    return u, v


class EmissionSample(NamedTuple):
    origin: jnp.ndarray  # (..., 3)
    direction: jnp.ndarray  # (..., 3)


def sample_light_emission(light_pos, light_dir, light_cutoff, is_parallel,
                          ball_r, scene_min, scene_max,
                          u1: jnp.ndarray, u2: jnp.ndarray) -> EmissionSample:
    """Sample an emitted ray from a light.

    Spot-sphere lights: cone-uniform direction around ``light_dir`` with half
    angle ``cutoff``, origin pushed to the ball surface (bdpt_cu.cu:64-89).
    Parallel lights: fixed direction, origin jittered on a plane of side
    ``2*scene_radius`` placed ``2*scene_radius`` behind the scene center
    (bdpt_cu.cu:39-63 — including its quirky ``min + max*0.5`` "center";
    we use the CPU oracle's correct ``(min+max)*0.5`` from cpu_bdpt.cpp:229,
    which the GPU PPM kernel also uses, ppm_cu.cu:179).
    """
    w = normalize(light_dir)
    u, v = _light_frame(w)

    # spot-sphere branch (cone-uniform)
    theta = jnp.arccos(1.0 - u1 * (1.0 - jnp.cos(light_cutoff)))
    phi = 2.0 * PI * u2
    local = jnp.stack(
        [jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi),
         jnp.cos(theta)], axis=-1)
    spot_dir = normalize(u * local[..., 0:1] + v * local[..., 1:2]
                         + w * local[..., 2:3])
    spot_origin = light_pos + spot_dir * ball_r[..., None]

    # parallel branch
    center = (scene_min + scene_max) * 0.5
    radius = 0.5 * jnp.sqrt(jnp.sum((scene_max - scene_min) ** 2))
    plane = radius * 2.0
    off_u = (u1 - 0.5) * plane
    off_v = (u2 - 0.5) * plane
    par_origin = (center - w * (radius * 2.0)
                  + u * off_u[..., None] + v * off_v[..., None])

    par = (is_parallel != 0)[..., None]
    return EmissionSample(
        origin=jnp.where(par, par_origin, spot_origin),
        direction=jnp.where(par, w, spot_dir),
    )
