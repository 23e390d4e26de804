"""Single-pixel debug harness.

Parity with reference ``render_single_pixel`` (integrator.rs:505-534, wired
to Ctrl-click in the viewer, viewer/mod.rs:304-318): re-trace every sample
of one pixel and print the per-sample radiance, as a CLI flag.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import math as pm
from ..core.camera import generate_rays
from ..core.film import sample_bounds
from ..integrator import PathConfig, trace_wave
from ..ops import sobol as sb
from ..utils.logging import get_logger

log = get_logger("integrator")


def render_single_pixel(camera, scene, cfg: PathConfig, pixel, spp: int):
    w, h = camera.resolution
    (x0, y0), (x1, y1) = sample_bounds(w, h)
    spp = pm.round_up_pow2(spp)
    domain = sb.SobolDomain.create((x0, y0), (x1, y1), spp)
    px = np.full(spp, pixel[0], np.int32)
    py = np.full(spp, pixel[1], np.int32)
    scramble, b_base = sb.pixel_statics(domain, px, py)
    inv_lo, inv_hi = sb.vdc_inv_rows(domain)
    pack = sb.sm32_device()
    r2c, rot, pos = camera.ray_params()

    # one lane per sample index; each lane gets its own sobol index
    lo = np.zeros(spp, np.uint32)
    hi = np.zeros(spp, np.uint32)
    for s in range(spp):
        flo, fhi, fdelta = sb.frame_statics(domain, s)
        l_, h_ = sb.sobol_index(
            jnp.asarray(b_base[s:s + 1]), jnp.uint32(fdelta),
            jnp.uint32(flo), jnp.uint32(fhi), inv_lo, inv_hi)
        lo[s], hi[s] = np.asarray(l_)[0], np.asarray(h_)[0]

    lo_d, hi_d = jnp.asarray(lo), jnp.asarray(hi)
    scr = jnp.asarray(scramble)
    # dims 0/1 unscrambled, matching render_band's camera-jitter deviation
    # note (integrator.py) so the debug pixel re-traces the film's samples
    s01 = sb.sobol_sample_dim2(lo_d, hi_d, 0, jnp.zeros_like(scr), pack)
    jx = jnp.clip(s01[..., 0] * domain.resolution + domain.p_min[0]
                  - px.astype(np.float32), 0.0, pm.ONE_MINUS_EPSILON)
    jy = jnp.clip(s01[..., 1] * domain.resolution + domain.p_min[1]
                  - py.astype(np.float32), 0.0, pm.ONE_MINUS_EPSILON)
    p_film = jnp.stack([px + jx, py + jy], axis=-1)
    log.info("render single pixel: %s (%d samples)", pixel, spp)
    o, d = generate_rays(r2c, rot, pos, p_film)
    for i in range(spp):
        log.debug("sample %d: p_film=%s ray o=%s d=%s", i,
                  np.asarray(p_film)[i], np.asarray(o)[i], np.asarray(d)[i])
    draw = lambda dim: sb.sobol_sample_dim(lo_d, hi_d, dim, scr, pack)
    draw2 = lambda dim: sb.sobol_sample_dim2(lo_d, hi_d, dim, scr, pack)
    radiance, rays, _bad, _occ = trace_wave(scene, cfg, draw, draw2, o, d)
    radiance = np.asarray(radiance)
    for i in range(spp):
        log.info("sample %d: L = %s", i, radiance[i])
    log.info("mean L = %s (%d rays traced)", radiance.mean(0), int(rays))
    return radiance
