"""Light tracing vs path tracing: two independent transport estimators.

The adjoint tracer (integrator_lt) samples paths FROM the lights via
sample_le and splats camera connections; the path tracer samples from
the camera. On the same scene at matched path-length coverage their
images must agree in expectation — a whole-system cross-check of
emission sampling, BSDF evaluation, visibility, and the camera model.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.core.camera import Camera, generate_rays, project_points
from pathtracer_tpu.integrator import PathConfig, PathIntegrator
from pathtracer_tpu.integrator_lt import LightTracer
from pathtracer_tpu.scene import meshgen
from pathtracer_tpu.scene.mitsuba import load_mitsuba
from pathtracer_tpu.scene.procedural import _plane_matrix
from pathtracer_tpu.scene.scene import MAT_MATTE, SceneBuilder


def _mean_img(film):
    a = np.asarray(film)
    return a[..., :3] / np.maximum(a[..., 3:4], 1e-9)


def _blocks(img, k):
    h, w, _ = img.shape
    return img.reshape(h // k, k, w // k, k, 3).mean((1, 3))


def test_project_inverts_raygen():
    cam = Camera.look_at([1.0, 2.0, 5.0], [0.0, 0.5, 0.0], [0, 1, 0],
                         np.pi / 3, (64, 48))
    rng = np.random.default_rng(2)
    p_film = jnp.asarray(
        rng.random((256, 2), np.float32) * np.asarray([64, 48], np.float32))
    r2c, rot, pos = cam.ray_params()
    o, d = generate_rays(r2c, rot, pos, p_film)
    t = jnp.asarray(1.0 + 9.0 * rng.random(256).astype(np.float32))
    p_world = o + t[:, None] * d
    c2r, w2c_rot, w2c_pos, fwd, imp = cam.project_params()
    raster, z_cam = project_points(c2r, w2c_rot, w2c_pos, p_world)
    assert (np.asarray(z_cam) < 0).all()  # in front of the pinhole
    np.testing.assert_allclose(np.asarray(raster), np.asarray(p_film),
                               rtol=1e-3, atol=5e-3)
    assert float(imp) > 0


@pytest.mark.slow
def test_lt_matches_pt_point_light():
    """Floor plane + point light: the s=2 transport class, exercising the
    sphere-emission branch of sample_le end to end."""
    b = SceneBuilder()
    mat = b.add_material(mtype=MAT_MATTE, kd=(0.6, 0.4, 0.2))
    pos, idx, nrm, _ = meshgen.gen_rectangle()
    p, n = meshgen.transform_mesh(pos, nrm,
                                  _plane_matrix([4, 0, 0], [0, 0, -4],
                                                [0, 0, 0]))
    b.add_mesh(p, idx, n, None, mat)
    b.add_point_light([0.0, 2.0, 0.0], (6.0, 6.0, 6.0))
    sd = b.build()
    cam = Camera.look_at([0, 3, 4], [0, 0, 0], [0, 1, 0], np.pi / 3,
                         (32, 32))
    cfg = PathConfig(max_depth=1)
    pt = _mean_img(PathIntegrator(cfg, spp=16).render(cam, sd))
    ltr = LightTracer(cfg, paths=1 << 17, wave=1 << 15, seed=1)
    lt_img = _mean_img(ltr.render(cam, sd))
    # the floor fills the lower image; compare block means there
    pb = _blocks(pt[16:, :, :], 8)
    lb = _blocks(lt_img[16:, :, :], 8)
    assert pb.mean() > 0.01
    np.testing.assert_allclose(lb.mean(), pb.mean(), rtol=0.05)
    np.testing.assert_allclose(lb, pb, rtol=0.2, atol=5e-3)


@pytest.mark.slow
def test_lt_matches_pt_cornell():
    """Cornell box: area-light emission (y0 direct connection + diffuse
    interreflection) against the reference-mode path tracer."""
    cam, sd, _ = load_mitsuba("data/cornell-box.xml", resolution=(32, 32))
    cfg = PathConfig(max_depth=2)
    pt = _mean_img(PathIntegrator(cfg, spp=64).render(cam, sd))
    ltr = LightTracer(cfg, paths=1 << 18, wave=1 << 16, seed=3)
    lt_img = _mean_img(ltr.render(cam, sd))
    assert pt.mean() > 0.01
    # global brightness: the two estimators integrate the same transport
    np.testing.assert_allclose(lt_img.mean(), pt.mean(), rtol=0.05)
    # spatial structure: 8x8-block means agree within MC noise
    np.testing.assert_allclose(_blocks(lt_img, 8), _blocks(pt, 8),
                               rtol=0.25, atol=0.01)
