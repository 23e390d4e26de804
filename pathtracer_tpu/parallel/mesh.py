"""Cross-chip data-parallel rendering over a jax.sharding.Mesh.

TPU-native replacement for the reference's rayon tile fan-out
(integrator.rs:617-637): the frame's row bands are sharded across devices
along a ``tiles`` mesh axis, the scene is replicated, each chip accumulates
its own partial padded film (the accumulator is additive — film.rs:213-228
merge is a sum) and the films are reduced with one ``psum`` over ICI.
Per-pixel Sobol seeding is position-based, so every sample is identical to
the single-chip render; only the film splat's add order at band boundaries
differs (last-ulp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import math as pm
from ..core.film import film_crop, film_pad_new, sample_bounds
from ..core.filter import filter_f1d as make_filter_f1d, make_filter
from ..integrator import (PathConfig, TracedScene, render_band,
                          _SEG_MIN_ROWS, _WAVE_DEPTH_BUDGET,
                          _seg_gen_impl, _seg_bounce_impl, _seg_splat_impl)
from ..ops import sobol as sb


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.array(devices), axis_names=("tiles",))


def make_mesh_2d(n_tiles: int, n_samples: int, devices=None) -> Mesh:
    """2D device mesh: row bands along ``tiles`` × sample frames along
    ``samples``. Both film contributions are additive, so the merge stays
    a single psum over both axes."""
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[: n_tiles * n_samples])
    return Mesh(devices.reshape(n_tiles, n_samples),
                axis_names=("tiles", "samples"))


def render_sharded(camera, scene, mesh: Mesh, cfg: PathConfig = PathConfig(),
                   spp: int = 4, filter_kind: str = "gaussian",
                   segmented: bool | None = None):
    """Render the full frame data-parallel over `mesh`; returns (H, W, 4).

    Each device renders one contiguous row band (padded to equal height)
    into its own padded film; a single psum over ICI merges them. A 2D
    mesh with a ``samples`` axis (make_mesh_2d) additionally shards the
    sample frames: device (i, k) renders band i's frames
    [k*spp/S, (k+1)*spp/S) — the additive accumulator makes the merge
    exact up to f32 summation order.

    ``segmented`` forces the per-bounce segmented program path on (True)
    or off (False); None applies the same fault-envelope predicate as the
    single-chip renderer, so Sponza-class scenes segment automatically.
    """
    if not isinstance(scene, TracedScene):
        scene = TracedScene.create(scene)
    w, h = camera.resolution
    f1d, radius = make_filter_f1d(filter_kind)
    f1d = tuple(float(v) for v in f1d)
    spp = pm.round_up_pow2(spp)
    (x0, y0), (x1, y1) = sample_bounds(w, h, radius)
    ws, hs = x1 - x0, y1 - y0
    domain = sb.SobolDomain.create((x0, y0), (x1, y1), spp)

    two_d = "samples" in mesh.axis_names
    n_samp = mesh.shape["samples"] if two_d else 1
    assert spp % n_samp == 0, "spp must divide over the samples axis"
    spp_local = spp // n_samp
    n_dev = mesh.shape["tiles"] if two_d else mesh.devices.size
    band = -(-hs // n_dev)

    # per-device pixel grids (padded rows masked by valid)
    px_all, py_all, valid_all, y0_all = [], [], [], []
    for di in range(n_dev):
        by0 = y0 + di * band
        xs, ys = np.meshgrid(np.arange(x0, x1), np.arange(by0, by0 + band),
                             indexing="xy")
        px_all.append(xs.ravel())
        py_all.append(ys.ravel())
        valid_all.append(ys.ravel() < y1)
        y0_all.append(by0)
    px = np.concatenate(px_all).astype(np.int32)
    py = np.concatenate(py_all).astype(np.int32)
    valid = np.concatenate(valid_all)
    scramble, b_base = sb.pixel_statics(domain, px, np.minimum(py, y1 - 1))
    band_y0s = np.asarray(y0_all, np.int32)

    frame_lo = np.zeros(spp, np.uint32)
    frame_hi = np.zeros(spp, np.uint32)
    frame_delta = np.zeros(spp, np.uint32)
    for s in range(spp):
        frame_lo[s], frame_hi[s], frame_delta[s] = sb.frame_statics(domain, s)
    inv_lo, inv_hi = sb.vdc_inv_rows(domain)
    sobol_pack = sb.sm32_device()
    r2c, cam_rot, cam_pos = camera.ray_params()
    dxdy_cam = camera.diff_params()
    diff_scale = jnp.float32(1.0 / np.sqrt(spp))
    ft = f1d

    frame_base = np.arange(0, spp, spp_local, dtype=np.int32)
    s_axis = "samples" if two_d else None
    psum_axes = ("tiles", "samples") if two_d else ("tiles",)

    # Big scenes render SEGMENTED (one jitted program per bounce) so a
    # sharded Sponza-class render can't exceed the axon lane-bounce fault
    # envelope any more than the single-chip path does (same predicate as
    # PathIntegrator.render_progressive).
    bw = getattr(scene, "bw_rows", None)
    if segmented is None:
        segmented = (bw is not None and bw.shape[0] >= _SEG_MIN_ROWS
                     and (cfg.max_depth + 1) * band * ws
                     > _WAVE_DEPTH_BUDGET)
    if segmented and bw is not None:
        return _render_sharded_segmented(
            camera, scene, mesh, cfg, spp, spp_local, band, ws, two_d,
            x0, y0, y1, w, h, domain, px, py, b_base, scramble, band_y0s,
            frame_lo, frame_hi, frame_delta, frame_base, inv_lo, inv_hi,
            sobol_pack, r2c, cam_rot, cam_pos, dxdy_cam, diff_scale, ft,
            radius)

    # check_vma=False: the wavefront while_loop carry starts with replicated
    # values (camera origin broadcast) that become varying after bounce 1;
    # the vma check would reject that even though the math is shard-local.
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("tiles"), P("tiles"), P("tiles"), P("tiles"),
                  P("tiles"), P(s_axis), P(s_axis), P(s_axis), P(s_axis)),
        out_specs=P(), check_vma=False)
    def shard_render(scene_rep, y0_s, px_s, py_s, b_base_s, scr_s,
                     f_lo_s, f_hi_s, f_delta_s, f_base_s):
        film_local = film_pad_new(w, h, extra_rows=band)
        valid_s = py_s < y1
        film_local, _rays, _bad, _occ = render_band(
            scene_rep, cfg, spp_local, (band, ws), valid_s, film_local,
            jnp.int32(x0), y0_s[0], px_s, py_s, b_base_s, scr_s,
            f_lo_s, f_hi_s, f_delta_s, f_base_s[0], inv_lo, inv_hi,
            r2c, cam_rot, cam_pos, ft, sobol_pack,
            jnp.float32(domain.resolution),
            jnp.float32(domain.p_min[0]), jnp.float32(domain.p_min[1]),
            total_spp_log2=pm.log2_int(spp), filter_radius=radius,
            dxdy_cam=dxdy_cam, diff_scale=diff_scale)
        return jax.lax.psum(film_local, psum_axes)

    film_pad = shard_render(scene, jnp.asarray(band_y0s), jnp.asarray(px),
                            jnp.asarray(py), jnp.asarray(b_base),
                            jnp.asarray(scramble),
                            jnp.asarray(frame_lo), jnp.asarray(frame_hi),
                            jnp.asarray(frame_delta),
                            jnp.asarray(frame_base))
    return film_crop(film_pad, w, h)


def _render_sharded_segmented(camera, scene, mesh, cfg, spp, spp_local,
                              band, ws, two_d, x0, y0, y1, w, h, domain,
                              px, py, b_base, scramble, band_y0s,
                              frame_lo, frame_hi, frame_delta, frame_base,
                              inv_lo, inv_hi, sobol_pack, r2c, cam_rot,
                              cam_pos, dxdy_cam, diff_scale, ft, radius):
    """Sharded SEGMENTED rendering: per-bounce device programs (like
    PathIntegrator._band_segmented) wrapped in shard_map, so no single
    program's lane-bounce product scales with max_depth. Wave state is
    sharded over (tiles[, samples]); each device accumulates its own
    padded film across its frames and the films are summed once at the
    end — the additive accumulator makes the merge exact up to f32
    summation order (film.rs:213-228 semantics)."""
    n_tiles = mesh.shape["tiles"] if two_d else mesh.devices.size
    n_samp = mesh.shape["samples"] if two_d else 1
    n_dev = n_tiles * n_samp
    comb = ("tiles", "samples") if two_d else ("tiles",)
    Pc = P(comb)            # per-(tile, sample-group) state
    lane = P("tiles")       # per-tile pixel statics (replicated over samples)
    s_spec = P("samples") if two_d else P()
    tsl = pm.log2_int(spp)
    with_diff = dxdy_cam is not None and (scene.has_tex
                                          or scene.has_normal_maps)
    band_shape = (band, ws)
    sob_scale = jnp.float32(domain.resolution)
    sob_ox = jnp.float32(domain.p_min[0])
    sob_oy = jnp.float32(domain.p_min[1])

    # wave-state scalars (rays, n_live) ride as (1,)-per-shard arrays so a
    # single Pc prefix spec covers every pytree leaf
    def _lift(st):
        return dict(st, rays=st["rays"].reshape(1),
                    n_live=st["n_live"].reshape(1))

    def _unlift(st):
        return dict(st, rays=st["rays"][0], n_live=st["n_live"][0])

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), lane, lane, lane, lane,
                  s_spec, s_spec, s_spec, s_spec),
        out_specs=Pc, check_vma=False)
    def seg_gen_sh(scene_rep, px_s, py_s, b_base_s, scr_s,
                   f_lo_s, f_hi_s, f_delta_s, frame_s):
        st, aux, jx, jy, rxd, ryd = _seg_gen_impl(
            scene_rep, cfg, px_s, py_s, b_base_s, scr_s,
            f_lo_s[0], f_hi_s[0], f_delta_s[0], frame_s[:1],
            inv_lo, inv_hi, r2c, cam_rot, cam_pos, sobol_pack,
            sob_scale, sob_ox, sob_oy, total_spp_log2=tsl,
            dxdy_cam=dxdy_cam, diff_scale=diff_scale)
        if rxd is None:  # keep the output pytree structure static
            rxd = ryd = jnp.zeros((px_s.shape[0], 3), jnp.float32)
        return _lift(st), aux, jx, jy, rxd, ryd

    def make_bounce(bounce):
        diff = with_diff and bounce == 0
        in_specs = (P(), Pc, Pc, lane) + ((Pc, Pc) if diff else ())

        @jax.jit
        @functools.partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                           out_specs=Pc, check_vma=False)
        def seg_bounce_sh(scene_rep, st, aux, scr_s, *diff_args):
            rxd, ryd = diff_args if diff else (None, None)
            st = _seg_bounce_impl(scene_rep, cfg, bounce, _unlift(st),
                                  aux, scr_s, sobol_pack,
                                  total_spp_log2=tsl, rxd=rxd, ryd=ryd)
            return _lift(st)
        return seg_bounce_sh

    bounce_progs = [make_bounce(b) for b in range(cfg.max_depth + 1)]

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(Pc, Pc, Pc, lane, Pc, lane),
        out_specs=(Pc, Pc, Pc), check_vma=False)
    def seg_splat_sh(st, jx, jy, valid_s, films, y0_s):
        film_local, rays, n_bad = _seg_splat_impl(
            cfg, band_shape, _unlift(st), jx, jy, valid_s, films[0],
            jnp.int32(x0), y0_s[0], filter_f1d=ft, filter_radius=radius)
        return films.at[0].set(film_local), rays.reshape(1), \
            n_bad.reshape(1)

    px_d = jnp.asarray(px)
    py_d = jnp.asarray(py)
    b_base_d = jnp.asarray(b_base)
    scr_d = jnp.asarray(scramble)
    valid_d = jnp.asarray(py < y1)
    y0s_d = jnp.asarray(band_y0s)
    fp0 = film_pad_new(w, h, extra_rows=band)
    films = jnp.zeros((n_dev,) + fp0.shape, fp0.dtype)
    for step in range(spp_local):
        fr = frame_base + step  # (n_samp,) global frame per sample-group
        st, aux, jx, jy, rxd, ryd = seg_gen_sh(
            scene, px_d, py_d, b_base_d, scr_d,
            jnp.asarray(frame_lo[fr]), jnp.asarray(frame_hi[fr]),
            jnp.asarray(frame_delta[fr]), jnp.asarray(fr))
        for bounce in range(cfg.max_depth + 1):
            if with_diff and bounce == 0:
                st = bounce_progs[bounce](scene, st, aux, scr_d, rxd, ryd)
            else:
                st = bounce_progs[bounce](scene, st, aux, scr_d)
        films, _rays, _bad = seg_splat_sh(st, jx, jy, valid_d, films,
                                          y0s_d)
    return film_crop(jnp.sum(films, axis=0), w, h)
