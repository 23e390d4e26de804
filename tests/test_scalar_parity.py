"""Radiance cross-validation: vectorized wavefront vs a scalar per-path
transcription of the reference li() (integrator.rs:392-503), sharing Sobol
samples. Converts self-golden regressions into algorithmic parity claims
(the transcription follows the REFERENCE control flow: per-path branches,
recursion exit, dual-branch MIS).

Coverage (VERDICT r3 item 6): matte/area-light (cornell), mirror + glass
(SpecularReflection + FresnelSpecular) with point/distant lights (Config B
material class), GGX metal (MicrofacetReflection + FresnelConductor,
Config C), and the infinite env light (2D-CDF sampling + pdf_li + le,
Config D).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from pathtracer_tpu.core.camera import Camera, generate_rays
from pathtracer_tpu.core.film import sample_bounds
from pathtracer_tpu.integrator import PathConfig, TracedScene, trace_wave
from pathtracer_tpu.ops import sobol as sb
from pathtracer_tpu.scene.mitsuba import load_mitsuba
from pathtracer_tpu.scene.scene import (MAT_GLASS, MAT_MATTE, MAT_METAL,
                                        MAT_MIRROR, SceneBuilder)
from pathtracer_tpu.scene import meshgen
from pathtracer_tpu.scene.procedural import (_camera, _ceiling_light,
                                             _plane_matrix, _room)

from scalar_li import HostScene, li

DATA = os.path.join(os.path.dirname(__file__), "..", "data")


def _parity_check(cam, sd, pixels, frame, max_depth, rtol=1e-4, atol=1e-5):
    """Trace the given pixels with the wavefront integrator and the scalar
    reference transcription on shared Sobol draws; assert equality."""
    res = cam.resolution
    scene = TracedScene.create(sd)
    hs = HostScene(sd)
    spp = 4
    (x0, y0), (x1, y1) = sample_bounds(*res)
    domain = sb.SobolDomain.create((x0, y0), (x1, y1), spp)

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

    cfg = PathConfig(max_depth=max_depth)
    l_wave, _, _, _ = trace_wave(scene, cfg, draw, draw2, o, d)
    l_wave = np.asarray(l_wave)

    o_h, d_h = np.asarray(o), np.asarray(d)
    draw_h = lambda dim: np.float32(np.asarray(draw(dim)))
    for i in range(len(pixels)):
        di = lambda dim: draw_h(dim)[i]
        d2i = lambda dim: (draw_h(dim)[i], draw_h(dim + 1)[i])
        l_ref = li(hs, di, d2i, o_h[i], d_h[i], cfg.max_depth)
        np.testing.assert_allclose(
            l_wave[i], l_ref, rtol=rtol, atol=atol,
            err_msg=f"pixel {pixels[i]} frame {frame}")


@pytest.mark.parametrize("frame", [0, 3])
def test_wavefront_matches_scalar_reference_li(frame):
    res = (64, 64)
    cam, sd, _ = load_mitsuba("data/cornell-box.xml", resolution=res)
    # a spread of pixels: light, ceiling, walls, boxes, floor
    pixels = [(32, 6), (10, 10), (55, 30), (32, 40), (20, 52),
              (45, 45), (5, 60), (60, 5)]
    _parity_check(cam, sd, pixels, frame, max_depth=5)


def _spec_scene():
    """Matte room + mirror panel + glass sphere + area light: exercises
    SpecularReflection (FresnelNoOp) and FresnelSpecular chains."""
    b = SceneBuilder()
    _room(b)
    _ceiling_light(b)
    mirror = b.add_material(mtype=MAT_MIRROR)
    pos, idx, nrm, _ = meshgen.gen_rectangle()
    m = _plane_matrix([0, 0, -1.6], [0, 1.6, 0], [-2.9, 2.8, 0.0])
    p, n = meshgen.transform_mesh(pos, nrm, m)
    b.add_mesh(p, idx, n, None, mirror)
    glass = b.add_material(mtype=MAT_GLASS, kd=(1, 1, 1), ks=(1, 1, 1),
                           eta=(1.5, 1.5, 1.5))
    pos, idx, nrm, _ = meshgen.gen_sphere((0.0, 1.6, 0.5), 1.3, 8, 8)
    b.add_mesh(pos, idx, nrm, None, glass)
    return _camera((64, 64)), b.build()


@pytest.mark.parametrize("frame", [0, 2])
def test_scalar_parity_mirror_glass(frame):
    cam, sd = _spec_scene()
    # center pixels see the glass sphere; left band the mirror panel
    pixels = [(32, 32), (28, 36), (36, 30), (12, 30), (10, 26),
              (32, 10), (50, 45)]
    _parity_check(cam, sd, pixels, frame, max_depth=8, rtol=2e-4)


def _metal_scene():
    """Matte room + GGX metal panel + area and point lights: exercises
    MicrofacetReflection/FresnelConductor and delta-light NEE."""
    b = SceneBuilder()
    _room(b)
    _ceiling_light(b)
    metal = b.add_material(mtype=MAT_METAL, ks=(1, 1, 1),
                           eta=(0.2, 0.92, 1.1), k=(3.9, 2.45, 2.14),
                           rough=(0.25, 0.25), remap=True)
    pos, idx, nrm, _ = meshgen.gen_rectangle()
    m = _plane_matrix([1.8, 0, 0], [0, 1.8, 0], [0.0, 2.2, -2.9])
    p, n = meshgen.transform_mesh(pos, nrm, m)
    b.add_mesh(p, idx, n, None, metal)
    b.add_point_light((0.0, 4.5, 2.0), (25.0, 25.0, 25.0))
    return _camera((64, 64)), b.build()


@pytest.mark.parametrize("frame", [0, 2])
def test_scalar_parity_metal_point_light(frame):
    cam, sd = _metal_scene()
    pixels = [(32, 28), (30, 24), (36, 26), (20, 40), (50, 12)]
    _parity_check(cam, sd, pixels, frame, max_depth=5, rtol=2e-4)


def _env_scene():
    """Ground + metal sphere under the HDR env light: exercises env
    le/pdf_li/2D-CDF importance sampling (light.rs:401-498)."""
    from pathtracer_tpu.utils.image import read_hdr
    b = SceneBuilder()
    ground = b.add_material(mtype=MAT_MATTE, kd=(0.6, 0.6, 0.6))
    pos, idx, nrm, _ = meshgen.gen_rectangle()
    m = _plane_matrix([8, 0, 0], [0, 0, -8], [0, 0, 0])
    p, n = meshgen.transform_mesh(pos, nrm, m)
    b.add_mesh(p, idx, n, None, ground)
    metal = b.add_material(mtype=MAT_METAL, ks=(1, 1, 1),
                           eta=(0.2, 0.92, 1.1), k=(3.9, 2.45, 2.14),
                           rough=(0.2, 0.2), remap=True)
    pos, idx, nrm, _ = meshgen.gen_sphere((0.0, 1.0, 0.0), 1.0, 8, 8)
    b.add_mesh(pos, idx, nrm, None, metal)
    img = read_hdr(os.path.join(DATA, "abandoned_tank_farm_04_1k.hdr"))
    b.set_environment(img, np.eye(3, dtype=np.float32))
    cam = Camera.look_at([0.0, 1.6, 5.0], [0.0, 0.9, 0.0], [0, 1, 0],
                         np.pi / 4, (64, 64))
    return cam, b.build()


@pytest.mark.parametrize("frame", [0, 2])
def test_scalar_parity_envmap(frame):
    cam, sd = _env_scene()
    # sky (escaped rays), sphere highlight, ground (env NEE + MIS)
    pixels = [(32, 8), (32, 30), (20, 50), (50, 50), (8, 20)]
    _parity_check(cam, sd, pixels, frame, max_depth=4, rtol=2e-4)


def _disney_scene():
    """Matte room + Disney panels (dielectric rough + metallic) under an
    area light: exercises DisneyDiffuse + DisneyFresnel microfacet with
    the separable Smith G and the 2-lobe sample_f remap
    (disney.rs:84-170, bsdf.rs:83-147) — the Sponza flagship material."""
    from pathtracer_tpu.scene.scene import MAT_DISNEY
    b = SceneBuilder()
    _room(b)
    _ceiling_light(b)
    rough_diel = b.add_material(mtype=MAT_DISNEY, kd=(0.7, 0.3, 0.2),
                                eta=(1.5, 1.5, 1.5),
                                misc=(0.0, 0.5, 0.0, 0.0))
    metallic = b.add_material(mtype=MAT_DISNEY, kd=(0.9, 0.7, 0.3),
                              eta=(1.5, 1.5, 1.5),
                              misc=(0.9, 0.2, 0.0, 0.0))
    pos, idx, nrm, _ = meshgen.gen_rectangle()
    m = _plane_matrix([1.5, 0, 0], [0, 1.5, 0], [-1.6, 2.2, -2.9])
    p, n = meshgen.transform_mesh(pos, nrm, m)
    b.add_mesh(p, idx, n, None, rough_diel)
    m = _plane_matrix([1.5, 0, 0], [0, 1.5, 0], [1.6, 2.2, -2.9])
    p, n = meshgen.transform_mesh(pos, nrm, m)
    b.add_mesh(p, idx, n, None, metallic)
    return _camera((64, 64)), b.build()


@pytest.mark.parametrize("frame", [0, 2])
def test_scalar_parity_disney(frame):
    cam, sd = _disney_scene()
    # left panel (rough dielectric), right panel (metallic), matte wall
    pixels = [(20, 28), (16, 24), (44, 28), (48, 24), (32, 50)]
    _parity_check(cam, sd, pixels, frame, max_depth=4, rtol=2e-4)


def _substrate_scene():
    """Matte room + FresnelBlend substrate panel under the area light
    (material/substrate.rs:42-69, microfacet.rs:408-469)."""
    from pathtracer_tpu.scene.scene import MAT_SUBSTRATE
    b = SceneBuilder()
    _room(b)
    _ceiling_light(b)
    sub = b.add_material(mtype=MAT_SUBSTRATE, kd=(0.5, 0.2, 0.2),
                         ks=(0.4, 0.4, 0.4), rough=(0.3, 0.3), remap=True)
    pos, idx, nrm, _ = meshgen.gen_rectangle()
    m = _plane_matrix([1.8, 0, 0], [0, 1.8, 0], [0.0, 2.2, -2.9])
    p, n = meshgen.transform_mesh(pos, nrm, m)
    b.add_mesh(p, idx, n, None, sub)
    return _camera((64, 64)), b.build()


@pytest.mark.parametrize("frame", [0, 2])
def test_scalar_parity_substrate(frame):
    cam, sd = _substrate_scene()
    pixels = [(32, 28), (26, 24), (40, 30), (32, 50), (12, 12)]
    _parity_check(cam, sd, pixels, frame, max_depth=4, rtol=2e-4)


def _roughglass_scene():
    """Matte room + rough-glass panel (MicrofacetReflection +
    MicrofacetTransmission, microfacet.rs:176-384): the camera sees the
    back wall THROUGH the panel plus its glossy reflection."""
    from pathtracer_tpu.scene.scene import MAT_ROUGHGLASS
    b = SceneBuilder()
    _room(b)
    _ceiling_light(b)
    rg = b.add_material(mtype=MAT_ROUGHGLASS, kd=(1.0, 1.0, 1.0),
                        ks=(1.0, 1.0, 1.0), eta=(1.5, 1.5, 1.5),
                        rough=(0.2, 0.2), remap=True)
    pos, idx, nrm, _ = meshgen.gen_rectangle()
    m = _plane_matrix([1.5, 0, 0], [0, 1.5, 0], [0.0, 2.0, 0.5])
    p, n = meshgen.transform_mesh(pos, nrm, m)
    b.add_mesh(p, idx, n, None, rg)
    return _camera((64, 64)), b.build()


@pytest.mark.parametrize("frame", [0, 2])
def test_scalar_parity_roughglass(frame):
    cam, sd = _roughglass_scene()
    # through-panel pixels + off-panel matte wall
    pixels = [(32, 30), (28, 26), (38, 34), (8, 8), (56, 50)]
    _parity_check(cam, sd, pixels, frame, max_depth=4, rtol=2e-4)
