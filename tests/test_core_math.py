"""Unit tests for core math parity (ref src/common/math.rs, mod.rs tests)."""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.core import math as pmath
from pathtracer_tpu.core.camera import Camera, generate_rays, transform_point


def test_gamma_bounds():
    assert pmath.gamma(3) > 0
    assert pmath.gamma(7) > pmath.gamma(3)
    eps = np.finfo(np.float32).eps * 0.5
    assert np.isclose(pmath.gamma(3), 3 * eps / (1 - 3 * eps))


def test_next_float_up_down():
    v = np.float32(1.5)
    up = np.asarray(pmath.next_float_up(v))
    dn = np.asarray(pmath.next_float_down(v))
    assert up == np.nextafter(v, np.float32(np.inf))
    assert dn == np.nextafter(v, np.float32(-np.inf))
    # zero crossing
    assert np.asarray(pmath.next_float_up(np.float32(-0.0))) > 0
    assert np.asarray(pmath.next_float_down(np.float32(0.0))) < 0


def test_coordinate_system_orthonormal():
    rng = np.random.default_rng(0)
    v1 = rng.normal(size=(64, 3)).astype(np.float32)
    v1 /= np.linalg.norm(v1, axis=-1, keepdims=True)
    v2, v3 = pmath.coordinate_system(jnp.asarray(v1))
    v2, v3 = np.asarray(v2), np.asarray(v3)
    assert np.allclose(np.sum(v1 * v2, -1), 0, atol=1e-5)
    assert np.allclose(np.sum(v1 * v3, -1), 0, atol=1e-5)
    assert np.allclose(np.linalg.norm(v2, axis=-1), 1, atol=1e-5)


def test_power_heuristic():
    assert np.isclose(pmath.power_heuristic(1, 1.0, 1, 1.0), 0.5)
    assert pmath.power_heuristic(1, 10.0, 1, 0.1) > 0.99


def test_offset_ray_origin_moves_off_surface():
    p = jnp.asarray([[1.0, 2.0, 3.0]])
    p_err = jnp.asarray([[1e-4, 1e-4, 1e-4]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    w_up = jnp.asarray([[0.0, 0.0, 1.0]])
    w_dn = jnp.asarray([[0.0, 0.0, -1.0]])
    po_up = np.asarray(pmath.offset_ray_origin(p, p_err, n, w_up))
    po_dn = np.asarray(pmath.offset_ray_origin(p, p_err, n, w_dn))
    assert po_up[0, 2] > 3.0
    assert po_dn[0, 2] < 3.0


def test_spherical_roundtrip():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(128, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    th = np.asarray(pmath.spherical_theta(jnp.asarray(v)))
    ph = np.asarray(pmath.spherical_phi(jnp.asarray(v)))
    rec = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph), np.cos(th)], -1)
    assert np.allclose(rec, v, atol=1e-5)


# Camera tests mirror ref common/mod.rs:103-164
def test_camera_screen_to_raster():
    cam = Camera.look_at([0, 0, 0], [1, 0, 0], [0, 1, 0],
                         np.pi / 2, (640, 480))
    from pathtracer_tpu.core.camera import screen_to_raster_matrix
    s2r = screen_to_raster_matrix(640, 480)
    p1 = transform_point(s2r, np.array([1.0, 1.0, 0.5]))
    assert np.allclose(p1, [640.0, 0.0, 0.5], atol=1e-5)
    p2 = transform_point(s2r, np.array([-1.0, -1.0, 0.5]))
    assert np.allclose(p2, [0.0, 480.0, 0.5], atol=1e-5)


def test_camera_raster_to_camera_center():
    # center raster point maps to camera-space near plane at z=-znear
    cam = Camera.look_at([0, 0, 0], [1, 0, 0], [0, 1, 0],
                         np.pi / 2, (640, 480), znear=0.1, zfar=1000.0)
    pc = transform_point(cam.raster_to_camera, np.array([320.0, 240.0, 0.0]))
    assert np.allclose(pc, [0.0, 0.0, -0.1], atol=1e-5)


def test_generate_rays_through_center():
    cam = Camera.look_at([10.0, 10.0, 10.0], [0, 0, 0], [0, 1, 0],
                         np.pi / 2, (640, 480))
    r2c, rot, pos = cam.ray_params()
    o, d = generate_rays(r2c, rot, pos, jnp.asarray([[320.0, 240.0]]))
    o, d = np.asarray(o), np.asarray(d)
    assert np.allclose(o[0], [10, 10, 10], atol=1e-5)
    to_origin = -o[0] / np.linalg.norm(o[0])
    assert np.allclose(d[0], to_origin, atol=1e-4)


def test_lanczos_sinc_filter_table():
    """Windowed sinc (the reference's todo!() filter, filter.rs:17-36):
    near-1 at the center, decaying, with the window zeroing at radius."""
    from pathtracer_tpu.core.filter import (filter_f1d,
                                            lanczos_sinc_filter_table)
    f, r = filter_f1d("lanczos")
    assert r == 2.0
    # first sample is close to sinc(~0.06) ~ 1
    assert 0.9 < f[0] <= 1.0
    # strictly positive at the center, small near the radius
    assert f[0] > abs(f[-1])
    t = lanczos_sinc_filter_table()
    np.testing.assert_allclose(t, np.outer(f, f), rtol=1e-6)
    # exact value check at one point: d = (8+0.5)*2/16 = 1.0625
    d = np.float32((8 + 0.5) * 2.0 / 16)
    sinc = lambda x: np.sin(np.pi * x) / (np.pi * x)
    np.testing.assert_allclose(f[8], sinc(d) * sinc(d / 3.0), rtol=1e-5)
