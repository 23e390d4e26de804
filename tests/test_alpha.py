"""Alpha-mask cutout tests (ref shape.rs:228-244 closest hit, :471-521
shadow rays; glTF import importer/gltf.rs:291-330)."""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.integrator import (PathConfig, PathIntegrator,
                                       TracedScene, _scene_intersect,
                                       _scene_intersect_p)
from pathtracer_tpu.scene.scene import MAT_MATTE, SceneBuilder


def _cutout_scene(alpha_img):
    """Floor at y=0, masked quad at y=1, point light at y=3."""
    b = SceneBuilder()
    floor = b.add_material(mtype=MAT_MATTE, kd=(0.8, 0.8, 0.8))
    quad_m = b.add_material(mtype=MAT_MATTE, kd=(0.2, 0.8, 0.2))
    a_txd = b.add_texture_image(np.repeat(alpha_img[..., None], 3, -1))
    fpos = np.array([[-5, 0, -5], [5, 0, -5], [5, 0, 5], [-5, 0, 5]],
                    np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]])
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    b.add_mesh(fpos, idx, None, uv, floor)
    qpos = np.array([[-2, 1, -2], [2, 1, -2], [2, 1, 2], [-2, 1, 2]],
                    np.float32)
    b.add_mesh(qpos, idx, None, uv, quad_m, alpha_txd=a_txd)
    b.add_point_light((0.0, 3.0, 0.0), (50.0, 50.0, 50.0))
    return TracedScene.create(b.build())


def test_closest_hit_passes_through_zero_alpha():
    """Rays through fully-masked texels must hit the floor behind."""
    alpha = np.zeros((8, 8), np.float32)
    alpha[:, 4:] = 1.0  # right half (u >= 0.5) opaque
    ts = _cutout_scene(alpha)
    # straight down: one ray through the masked half (u<0.5 → x<0 of quad),
    # one through the opaque half
    o = jnp.asarray([[-1.0, 2.0, 0.0], [1.0, 2.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0]] * 2, jnp.float32)
    hit = _scene_intersect(ts, o, d, jnp.full((2,), np.inf, jnp.float32))
    assert bool(np.asarray(hit["valid"]).all())
    # masked lane continues to the floor (quad tris are id 2,3 after the
    # floor's 2; use hit material via tri -> floor is material 0 rows 0/1)
    tri = np.asarray(hit["tri"])
    assert tri[0] in (0, 1), f"masked texel should be skipped, hit {tri[0]}"
    assert tri[1] in (2, 3), f"opaque texel should block, hit {tri[1]}"


def test_shadow_rays_pass_through_zero_alpha():
    alpha = np.zeros((8, 8), np.float32)
    alpha[:, 4:] = 1.0
    ts = _cutout_scene(alpha)
    # shadow feelers from the floor straight up to the light at y=3
    o = jnp.asarray([[-1.0, 0.01, 0.0], [1.0, 0.01, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]] * 2, jnp.float32)
    occ = _scene_intersect_p(ts, o, d, jnp.full((2,), 2.9, jnp.float32))
    occ = np.asarray(occ)
    assert not occ[0], "zero-alpha texel must not occlude"
    assert occ[1], "opaque texel must occlude"


def test_cutout_render_shadows():
    """End-to-end: the floor under the masked half is lit, under the
    opaque half shadowed."""
    from pathtracer_tpu.core.camera import Camera
    from pathtracer_tpu.core.film import to_rgb
    alpha = np.zeros((8, 8), np.float32)
    alpha[:, 4:] = 1.0
    ts = _cutout_scene(alpha)
    cam = Camera.look_at([0, 4.0, 4.5], [0, 0, 0], [0, 1, 0],
                         np.pi / 3, (48, 48))
    film = PathIntegrator(PathConfig(max_depth=1), spp=4).render(cam, ts)
    rgb = np.asarray(to_rgb(film))
    assert np.isfinite(rgb).all()
    # sample floor points left (masked above → lit) vs right (shadowed):
    # project: just compare mean brightness of left vs right image halves'
    # central rows (camera is symmetric)
    mid = rgb[28:40]
    left = mid[:, 8:20].mean()
    right = mid[:, 28:40].mean()
    assert left > 2.0 * right, (left, right)
