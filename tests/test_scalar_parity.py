"""Radiance cross-validation: vectorized wavefront vs a scalar per-path
transcription of the reference li() (integrator.rs:392-503) on cornell
pixels, sharing Sobol samples. Converts the self-golden regression into an
algorithmic parity claim (the transcription follows the REFERENCE control
flow: per-path branches, recursion exit, dual-branch MIS)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer_tpu.core.camera import generate_rays
from pathtracer_tpu.core.film import sample_bounds
from pathtracer_tpu.integrator import PathConfig, TracedScene, trace_wave
from pathtracer_tpu.ops import sobol as sb
from pathtracer_tpu.scene.mitsuba import load_mitsuba

from scalar_li import HostScene, li


@pytest.mark.parametrize("frame", [0, 3])
def test_wavefront_matches_scalar_reference_li(frame):
    res = (64, 64)
    cam, sd, _ = load_mitsuba("data/cornell-box.xml", resolution=res)
    scene = TracedScene.create(sd)
    hs = HostScene(sd)
    spp = 4
    (x0, y0), (x1, y1) = sample_bounds(*res)
    domain = sb.SobolDomain.create((x0, y0), (x1, y1), spp)

    # a spread of pixels: light, ceiling, walls, boxes, floor
    pixels = [(32, 6), (10, 10), (55, 30), (32, 40), (20, 52),
              (45, 45), (5, 60), (60, 5)]
    px = np.asarray([p[0] for p in pixels], np.int32)
    py = np.asarray([p[1] for p in pixels], np.int32)
    scramble, b_base = sb.pixel_statics(domain, px, py)
    f_lo, f_hi, f_delta = sb.frame_statics(domain, frame)
    inv_lo, inv_hi = sb.vdc_inv_rows(domain)
    pack = sb.sm32_device()
    lo, hi = sb.sobol_index(jnp.asarray(b_base), jnp.uint32(f_delta),
                            jnp.uint32(f_lo), jnp.uint32(f_hi),
                            inv_lo, inv_hi)
    scr = jnp.asarray(scramble)
    draw = lambda dim: sb.sobol_sample_dim(lo, hi, dim, scr, pack)
    draw2 = lambda dim: sb.sobol_sample_dim2(lo, hi, dim, scr, pack)

    s01 = sb.sobol_sample_dim2(lo, hi, 0, jnp.zeros_like(scr), pack)
    jx = jnp.clip(s01[..., 0] * domain.resolution + domain.p_min[0]
                  - px.astype(np.float32), 0.0, 1.0 - 1e-7)
    jy = jnp.clip(s01[..., 1] * domain.resolution + domain.p_min[1]
                  - py.astype(np.float32), 0.0, 1.0 - 1e-7)
    p_film = jnp.stack([px + jx, py + jy], axis=-1)
    r2c, rot, pos = cam.ray_params()
    o, d = generate_rays(r2c, rot, pos, p_film)

    cfg = PathConfig(max_depth=5)
    l_wave, _, _, _ = trace_wave(scene, cfg, draw, draw2, o, d)
    l_wave = np.asarray(l_wave)

    o_h, d_h = np.asarray(o), np.asarray(d)
    draw_h = lambda dim: np.float32(np.asarray(draw(dim)))
    for i in range(len(pixels)):
        di = lambda dim: draw_h(dim)[i]
        d2i = lambda dim: (draw_h(dim)[i], draw_h(dim + 1)[i])
        l_ref = li(hs, di, d2i, o_h[i], d_h[i], cfg.max_depth)
        np.testing.assert_allclose(
            l_wave[i], l_ref, rtol=1e-4, atol=1e-5,
            err_msg=f"pixel {pixels[i]} frame {frame}")
