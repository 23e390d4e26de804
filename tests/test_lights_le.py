"""Emission sampling (sample_le / pdf_le / power).

The reference declares these on its Light trait (light.rs:59-77) but every
sample_le/pdf_le body is ``todo!()``; we implement PBRT-v3 semantics. The
key invariant: for an area light the power estimator built from sample_le,
    le * cos(n_light, d) / (pdf_pos * pdf_dir),
is ZERO-VARIANCE and equals power() exactly — pinning both APIs at once.
"""

import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.ops.lights import pdf_le, power, sample_le
from pathtracer_tpu.scene.scene import (LIGHT_AREA, LIGHT_DISTANT,
                                        LIGHT_INFINITE, LIGHT_POINT,
                                        MAT_MATTE, SceneBuilder,
                                        pack_light_attr)

EMIT = np.array([4.0, 5.0, 6.0], np.float32)
INTENS = np.array([2.0, 3.0, 4.0], np.float32)
RAD = np.array([1.0, 0.5, 0.25], np.float32)
LSET = (LIGHT_AREA, LIGHT_POINT, LIGHT_DISTANT, LIGHT_INFINITE)


def _scene():
    b = SceneBuilder()
    mat = b.add_material(mtype=MAT_MATTE, kd=(0.5, 0.5, 0.5))
    p = np.array([[0, 0, 0], [2, 0, 0], [0, 3, 0]], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    b.add_mesh(p, idx, None, None, mat, emission=EMIT)
    b.add_point_light([1.0, 2.0, 3.0], INTENS)
    b.add_distant_light([0.0, -1.0, 0.5], RAD)
    b.set_environment(np.ones((4, 8, 3), np.float32), np.eye(3))
    return b.build()
    # light indices: 0 = area tri, 1 = point, 2 = distant, 3 = infinite


def _rows(sd, idx, n):
    la = pack_light_attr(sd)
    return jnp.asarray(np.tile(np.asarray(la)[idx][None, :], (n, 1)))


def _draws(n, seed=7):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.random((n, 2), np.float32)),
            jnp.asarray(rng.random((n, 2), np.float32)))


def test_area_power_estimator_zero_variance():
    sd = _scene()
    n = 1024
    rows = _rows(sd, 0, n)
    u_pos, u_dir = _draws(n)
    s = sample_le(sd, rows, u_pos, u_dir, light_set=LSET)
    cos = np.asarray(jnp.sum(s["n_light"] * s["d"], -1))
    est = np.asarray(s["le"]) * cos[:, None] / (
        np.asarray(s["pdf_pos"]) * np.asarray(s["pdf_dir"]))[:, None]
    area = 0.5 * np.linalg.norm(np.cross([2, 0, 0], [0, 3, 0]))
    phi = EMIT * area * np.pi
    np.testing.assert_allclose(est, np.tile(phi, (n, 1)), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(power(sd, rows, LSET))[0], phi,
                               rtol=1e-5)


def test_sample_pdf_le_consistency():
    """pdf_le at a sampled emission ray returns the sampled pdfs
    (delta dimensions excepted: point pdf_pos, distant pdf_dir)."""
    sd = _scene()
    n = 512
    u_pos, u_dir = _draws(n, seed=11)
    for idx, check_pos, check_dir in ((0, True, True), (1, False, True),
                                      (2, True, False), (3, True, True)):
        rows = _rows(sd, idx, n)
        s = sample_le(sd, rows, u_pos, u_dir, light_set=LSET)
        pp, pd = pdf_le(sd, rows, s["d"], s["n_light"], light_set=LSET)
        if check_pos:
            np.testing.assert_allclose(np.asarray(pp),
                                       np.asarray(s["pdf_pos"]), rtol=1e-4,
                                       err_msg=f"light {idx} pdf_pos")
        else:
            assert (np.asarray(pp) == 0).all()  # delta position
        if check_dir:
            np.testing.assert_allclose(np.asarray(pd),
                                       np.asarray(s["pdf_dir"]), rtol=2e-3,
                                       atol=1e-6, err_msg=f"light {idx}")
        else:
            assert (np.asarray(pd) == 0).all()  # delta direction
        # emitted directions are unit for every type
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(s["d"]), axis=-1), 1.0, atol=1e-5)


def test_point_light_sphere_sampling():
    sd = _scene()
    n = 4096
    rows = _rows(sd, 1, n)
    u_pos, u_dir = _draws(n, seed=3)
    s = sample_le(sd, rows, u_pos, u_dir, light_set=LSET)
    d = np.asarray(s["d"])
    assert np.abs(d.mean(0)).max() < 0.05  # uniform over the sphere
    np.testing.assert_allclose(np.asarray(s["o"]), np.tile([1, 2, 3], (n, 1)),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s["pdf_dir"]), 0.25 / np.pi)
    np.testing.assert_allclose(np.asarray(power(sd, rows, LSET))[0],
                               4 * np.pi * INTENS, rtol=1e-5)


def test_distant_light_disk_origin():
    sd = _scene()
    n = 256
    rows = _rows(sd, 2, n)
    u_pos, u_dir = _draws(n, seed=5)
    s = sample_le(sd, rows, u_pos, u_dir, light_set=LSET)
    w = np.array([0.0, -1.0, 0.5]) / np.linalg.norm([0.0, -1.0, 0.5])
    np.testing.assert_allclose(np.asarray(s["d"]), np.tile(-w, (n, 1)),
                               atol=1e-6)
    r = float(sd.world_radius)
    off = np.asarray(s["o"]) - np.asarray(sd.world_center)
    # origin sits on the disk at +r along the light direction
    np.testing.assert_allclose(off @ w, r, rtol=1e-4)
    assert (np.linalg.norm(off - np.outer(off @ w, w), axis=-1)
            <= r * (1 + 1e-4)).all()
    np.testing.assert_allclose(np.asarray(s["pdf_pos"]),
                               1.0 / (np.pi * r * r), rtol=1e-5)


def test_env_emission_furnace():
    """Constant env: every sampled le is 1 and E[1/pdf_dir] = 4π (the MC
    estimate of the sphere's solid angle under the 2D-CDF sampler)."""
    sd = _scene()
    n = 8192
    rows = _rows(sd, 3, n)
    u_pos, u_dir = _draws(n, seed=13)
    s = sample_le(sd, rows, u_pos, u_dir, light_set=LSET)
    np.testing.assert_allclose(np.asarray(s["le"]), 1.0, rtol=1e-5)
    inv = 1.0 / np.asarray(s["pdf_dir"])
    np.testing.assert_allclose(inv.mean(), 4 * np.pi, rtol=0.05)
