"""White-furnace integrator validation (SURVEY §4 analytic invariants).

A Lambertian plane of albedo rho under a uniform-radiance environment must
converge to L = rho * L_env seen from anywhere (the furnace closes over
all bounces: sum_k rho^k * (1-rho) terms telescope to rho when the path
escapes; with NEE+MIS both estimators must agree and stay unbiased)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer_tpu.core.camera import Camera
from pathtracer_tpu.integrator import PathConfig, PathIntegrator
from pathtracer_tpu.scene import meshgen
from pathtracer_tpu.scene.scene import MAT_MATTE, SceneBuilder


def _furnace_scene(rho):
    b = SceneBuilder()
    mat = b.add_material(mtype=MAT_MATTE, kd=(rho, rho, rho))
    pos, idx, nrm, _ = meshgen.gen_rectangle()
    m = np.asarray([[50, 0, 0, 0], [0, 0, 1, 0], [0, 50, 0, 0],
                    [0, 0, 0, 1.0]], np.float64)  # huge floor, normal +y
    from pathtracer_tpu.scene.procedural import _plane_matrix
    m = _plane_matrix([50, 0, 0], [0, 0, -50], [0, 0, 0])
    p, n = meshgen.transform_mesh(pos, nrm, m)
    b.add_mesh(p, idx, n, None, mat)
    env = np.ones((4, 8, 3), np.float32)  # uniform white environment
    b.set_environment(env, np.eye(3))
    return b.build()


@pytest.mark.parametrize("rho", [0.8])
def test_white_furnace_plane(rho):
    scene = _furnace_scene(rho)
    cam = Camera.look_at([0, 3, 6], [0, 0, 0], [0, 1, 0], np.pi / 3,
                         (24, 24))
    film = PathIntegrator(PathConfig(max_depth=16, rr_enable=False),
                          spp=64).render(cam, scene)
    rgb = np.asarray(film[..., :3] / np.maximum(np.asarray(film[..., 3:4]),
                                                1e-9))
    # center pixels look at the floor; with uniform env L=1 the floor's
    # outgoing radiance after k bounces is rho + rho^2*(...), bounded by
    # the geometric closure rho/(1-rho*0.5)... with only a lower
    # hemisphere floor the first-order term dominates: L ≈ rho * 1 plus
    # interreflection; assert within the analytic bracket [rho, rho/(1-rho)]
    center = rgb[10:14, 10:14].mean()
    assert rho * 0.93 < center < min(rho / (1 - rho), 1.5), center


def test_uniform_env_unoccluded_equals_env():
    """Rays that see only the environment return exactly its radiance."""
    scene = _furnace_scene(0.5)
    cam = Camera.look_at([0, 3, 6], [0, 30, 0], [0, 1, 0], np.pi / 3,
                         (16, 16))  # look up at the sky
    film = PathIntegrator(PathConfig(max_depth=3), spp=4).render(cam, scene)
    rgb = np.asarray(film[..., :3] / np.maximum(np.asarray(film[..., 3:4]),
                                                1e-9))
    np.testing.assert_allclose(rgb[:4].mean((0, 1)), [1, 1, 1], rtol=0.02)
