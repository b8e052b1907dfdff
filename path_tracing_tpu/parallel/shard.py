"""Multi-chip sharding via ``shard_map`` over a device mesh.

The reference is single-GPU, single-process (SURVEY.md §2.2); this module is
the scaling design it lacks:

- **PT**: pixels are data-parallel — shard the flat lane axis over the mesh;
  no collectives (each shard owns its pixels' accumulation).
- **BDPT**: light subpaths shard over the mesh; the (small) light-vertex
  tensor is ``all_gather``-ed over ICI so every shard connects its pixels
  against ALL light vertices — the only cross-chip traffic the algorithm
  needs.
- **PPM**: photons shard and their event tensors NEVER cross chips; the
  pixel-sized hitpoint table is all-gathered, each shard joins local events
  against all hitpoints, and the (B, 3) flux merges with ``psum_scatter``
  back to the pixel owners.

Meshes can be flat (single host: ``("dp",)``) or hybrid multi-host
(``("dcn", "dp")`` via ``make_mesh(..., dcn=k)``): the renderers shard their
lane axis over ALL mesh axes and run their collectives over the full axis
tuple, which XLA decomposes hierarchically (ICI inside a host, DCN across).

**Mesh-invariant RNG**: every per-lane draw uses GLOBAL Threefry counters
(``rng.uniforms_g`` with ``start = mesh_linear_index * lanes_per_shard``),
so each shard draws the exact bits of the matching single-device lane
slice.  Consequences, pinned by ``__graft_entry__.dryrun_multichip`` and
``tests/test_sharding.py``: a sharded PT/BDPT render is per-pixel
BIT-EXACT against single-device on the XLA tiers (PPM matches to float
associativity of its flux ``psum``), and any two mesh shapes of any size
render identical images.  The only exception is the TPU megakernel tiers'
on-core PRNG, which decorrelates shards via a start-folded seed (same
estimator, different stream).

Everything compiles and runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count=N``) for hardware-free CI.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 promotes shard_map out of experimental (and renames
    # check_rep -> check_vma)
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True):
        # default True to match upstream check_rep/check_vma semantics
        # (ADVICE r1: a call site omitting it must not silently lose
        # replication checking)
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..config import RenderConfig
from ..scene.types import Camera, Scene


def make_mesh(n_devices: int | None = None, axis: str = "dp",
              dcn: int = 1) -> Mesh:
    """Build the render mesh.

    ``dcn=1`` (default) gives the flat single-host mesh.  ``dcn>1`` builds a
    2-D ``("dcn", axis)`` mesh for multi-host slices: the leading axis maps
    hosts (data-center network), the trailing axis chips within a host (ICI).
    All three renderers shard their lane axis over BOTH axes; since the only
    collectives are the BDPT vertex all-gather and the PPM flux
    psum_scatter, XLA decomposes them hierarchically — the bulky per-chip
    phase rides ICI and only the small reduced tensor crosses DCN.  On a
    real multi-host slice build the mesh from
    ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` and pass it
    straight to the ``render_*_sharded`` functions (they accept any mesh).
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    if dcn > 1:
        assert len(devs) % dcn == 0, (
            f"{len(devs)} devices do not split into {dcn} DCN groups")
        return Mesh(np.array(devs).reshape(dcn, -1), ("dcn", axis))
    return Mesh(np.array(devs), (axis,))


def _mesh_axes(mesh: Mesh):
    """(axis-name tuple, lane PartitionSpec) for 1-D or hybrid meshes."""
    ax = tuple(mesh.axis_names)
    return ax, P(ax)


def _linear_index(mesh: Mesh):
    """This shard's position in mesh-flattening order (row-major over the
    axis tuple) — the decorrelation index for per-shard RNG folds.  Matches
    ``all_gather(tiled=True)``'s concatenation order, so hybrid and flat
    meshes of the same size produce identical per-shard keys and identical
    gathered tensors."""
    idx = 0
    for name in mesh.axis_names:
        idx = idx * mesh.shape[name] + jax.lax.axis_index(name)
    return idx


def render_pt_sharded(scene: Scene, cam: Camera, width: int, height: int,
                      spp: int, cfg: RenderConfig, key, mesh: Mesh) -> jnp.ndarray:
    """Pixel-sharded PT: each device traces ``W*H/n`` lanes; zero collectives.

    Each shard runs the SAME tier dispatch as single-chip ``render_pt``
    (``wavefront_pt``): the persistent Pallas megakernel / fused-shade
    pipeline on TPU, the XLA regenerating wavefront elsewhere — so per-chip
    throughput on a slice matches the single-chip headline instead of
    falling back to the scan tier."""
    from ..integrators.pt import wavefront_pt

    n = mesh.devices.size
    B = width * height
    assert B % n == 0, f"pixels ({B}) must divide the mesh ({n})"
    ax, lane = _mesh_axes(mesh)
    idx = jnp.arange(B, dtype=jnp.int32)
    px = idx % width
    py = idx // width

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), lane, lane, P()),
             out_specs=lane, check_rep=False)
    def shard_fn(scene, cam, px_l, py_l, key):
        me = _linear_index(mesh)
        # global-counter RNG: this shard draws rows [me*B/n, (me+1)*B/n) of
        # the single-device (B,) draw — per-pixel bit-exact vs single chip
        return wavefront_pt(scene, cam, cfg, px_l, py_l, spp, key,
                            start=me * (B // n), total=B) / spp

    return shard_fn(scene, cam, px, py, key)


def render_ppm_sharded(scene: Scene, cam: Camera, width: int, height: int,
                       spl: int, cfg: RenderConfig, key, mesh: Mesh) -> jnp.ndarray:
    """PPM over the mesh: the eye pass is pixel-sharded; photons shard over
    the mesh and each shard gathers flux for its OWN pixels' hitpoints from
    its local photons, so the per-pixel flux merge is a ``psum`` over the
    mesh axis — the TPU equivalent of the reference's global atomicAdd flux
    buffer (ppm_cu.cu:253-254).
    """
    from ..integrators.ppm import (gather_flux_dispatch, ppm_eye_trace,
                                   ppm_photon_trace)
    from ..ops.math3 import PI, clamp_radiance, is_valid_color

    n = mesh.devices.size
    B = width * height
    assert B % n == 0
    ax, lane = _mesh_axes(mesh)
    true_photons = scene.num_lights * spl
    num_photons = ((true_photons + n - 1) // n) * n  # mesh-rounding pad

    idx = jnp.arange(B, dtype=jnp.int32)
    px = idx % width
    py = idx // width

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), lane, lane, P()),
             out_specs=lane, check_rep=False)
    def shard_fn(scene_s, cam_s, px_l, py_l, key):
        me = _linear_index(mesh)
        direct, hp_local = ppm_eye_trace(scene_s, cam_s, cfg, px_l, py_l,
                                         jax.random.fold_in(key, 1),
                                         start=me * (B // n), total=B)
        # Photon events STAY on the chip that traced them (they are the big
        # tensor: photons x light_iters rows).  Instead the small per-pixel
        # hitpoint table is all-gathered (B rows total — pixel-sized), every
        # shard joins its LOCAL events against all hitpoints, and the
        # per-hitpoint flux (B, 3) is merged with a psum_scatter back to the
        # pixel owner — a true reduction over ICI, the TPU equivalent of the
        # reference's global atomicAdd flux buffer (ppm_cu.cu:253-254).
        # global start/total keep the light assignment (global photon
        # index % num_lights) identical to single-device — each light gets
        # exactly spl photons across the WHOLE mesh — and kill the
        # mesh-rounding pad lanes (no silent flux inflation)
        # key is NOT me-folded: ppm_photon_trace's start/total now route the
        # RNG too (global counters), so local events are the bit-exact slice
        # of the single-device event tensor
        ev_local = ppm_photon_trace(
            scene_s, cfg, num_photons // n, spl,
            jax.random.fold_in(key, 2),
            start=me * (num_photons // n), total=true_photons)
        hp_all = jax.tree.map(
            lambda x: jax.lax.all_gather(x, ax, axis=0, tiled=True),
            hp_local)
        flux_part, count_part, _ = gather_flux_dispatch(scene_s, cfg, hp_all,
                                                        ev_local)
        flux = jax.lax.psum_scatter(flux_part, ax, scatter_dimension=0,
                                    tiled=True)
        count = jax.lax.psum_scatter(count_part, ax, scatter_dimension=0,
                                     tiled=True)
        radiance = flux / max(PI * cfg.ppm_radius * cfg.ppm_radius, 1e-6)
        radiance = jnp.where(
            (hp_local.valid & is_valid_color(radiance))[:, None],
            clamp_radiance(radiance, cfg.clamp), 0.0)
        return direct + radiance + 0.0 * jnp.sum(count)

    return shard_fn(scene, cam, px, py, key)


def render_bdpt_sharded(scene: Scene, cam: Camera, width: int, height: int,
                        spp: int, spl: int, cfg: RenderConfig, key,
                        mesh: Mesh, light_sample: int = 0,
                        chunk: int = 32) -> jnp.ndarray:
    """BDPT over the mesh: light paths sharded + all_gather of the vertex
    tensor over ICI; eye pixels sharded.

    The per-shard eye pass reuses ``integrators.bdpt.eye_pass`` — the same
    tier dispatch as single-chip (persistent eye megakernel + RIS
    resampling on TPU, the scan + connection-kernel path elsewhere)."""
    from ..integrators.bdpt import eye_pass, trace_light_paths

    n = mesh.devices.size
    B = width * height
    assert B % n == 0
    ax, lane = _mesh_axes(mesh)
    ls = light_sample or spl
    true_paths = scene.num_lights * ls * spl
    num_paths = ((true_paths + n - 1) // n) * n  # pad to the mesh
    scene_used = scene.with_illum_scaled(1.0 / ls)

    idx = jnp.arange(B, dtype=jnp.int32)
    px = idx % width
    py = idx // width

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), lane, lane, P()),
             out_specs=lane, check_rep=False)
    def shard_fn(scene_s, cam_s, px_l, py_l, key):
        me = _linear_index(mesh)
        # each shard traces its slice of the light paths with a decorrelated
        # key, then the vertex tensor is gathered over ICI (it is small:
        # paths*light_depth vertices)
        # global start/total: light assignment (global path index % Nl)
        # matches single-device, and mesh-rounding pad lanes store nothing
        # key is NOT me-folded: start/total route the RNG through global
        # counters, so the gathered vertex tensor is bit-identical to the
        # single-device trace (all_gather(tiled) concatenates in mesh-linear
        # order = global lane order)
        lv_local = trace_light_paths(
            scene_s, cfg, num_paths // n, spl,
            jax.random.fold_in(key, 0x0101),
            start=me * (num_paths // n), total=true_paths)
        lv = jax.tree.map(
            lambda x: jax.lax.all_gather(x, ax, axis=0, tiled=True),
            lv_local)
        # eye sampling also draws global counters (bit-exact per pixel on
        # the XLA tier; the TPU eye megakernel decorrelates by start-folded
        # seed), then runs the shared tier dispatch on this shard's pixels
        return eye_pass(scene_s, lv, cam_s, cfg, px_l, py_l, spp,
                        key, float(ls), chunk,
                        start=me * (B // n), total=B)

    return shard_fn(scene_used, cam, px, py, key)
