"""Alpha-mask cutout tests (ref shape.rs:228-244 closest hit, :471-521
shadow rays; glTF import importer/gltf.rs:291-330)."""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.integrator import (PathConfig, PathIntegrator,
                                       TracedScene, _scene_intersect,
                                       _scene_intersect_p)
from pathtracer_tpu.scene.scene import MAT_MATTE, SceneBuilder


def _cutout_scene(alpha_img, use_bvh=None):
    """Floor at y=0, masked quad at y=1, point light at y=3."""
    b = _cutout_builder(alpha_img)
    return TracedScene.create(b.build(), use_bvh=use_bvh)


def _cutout_builder(alpha_img):
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
    return b


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


def test_bvh_inline_alpha_matches_retry_path():
    """The BVH traversal's INLINE alpha test (accel/bvh._alpha_test_inline)
    must agree with the non-BVH re-spawn retry path for both closest hits
    and shadow rays, including partial-alpha bilinear edges."""
    rng = np.random.default_rng(7)
    alpha = (rng.random((16, 16)) < 0.5).astype(np.float32)
    ts_brute = _cutout_scene(alpha, use_bvh=False)
    ts_bvh = _cutout_scene(alpha, use_bvh=True)
    n = 256
    o = np.stack([rng.uniform(-3, 3, n), np.full(n, 2.5),
                  rng.uniform(-3, 3, n)], -1).astype(np.float32)
    d = np.tile(np.array([[0.0, -1.0, 0.0]], np.float32), (n, 1))
    t_inf = jnp.full((n,), np.inf, jnp.float32)
    h1 = _scene_intersect(ts_brute, jnp.asarray(o), jnp.asarray(d), t_inf)
    h2 = _scene_intersect(ts_bvh, jnp.asarray(o), jnp.asarray(d), t_inf)
    np.testing.assert_array_equal(np.asarray(h1["valid"]),
                                  np.asarray(h2["valid"]))
    # compare by hit material (tri ids are permuted by the BVH build)
    m1 = np.asarray(ts_brute.data.material_id)[np.asarray(h1["tri"])]
    m2 = np.asarray(ts_bvh.data.material_id)[np.asarray(h2["tri"])]
    ok = np.asarray(h1["valid"])
    np.testing.assert_array_equal(m1[ok], m2[ok])
    # the retry path measures t from the re-spawn origin (documented wart);
    # the inline path must report the TRUE t: hit y = o_y - t ∈ {0, 1}
    y_hit = o[ok, 1] - np.asarray(h2["t"])[ok]
    y_expect = np.where(m2[ok] == 1, 1.0, 0.0)
    np.testing.assert_allclose(y_hit, y_expect, atol=1e-4)
    occ1 = _scene_intersect_p(ts_brute, jnp.asarray(o), jnp.asarray(d),
                              jnp.full((n,), 2.4, jnp.float32))
    occ2 = _scene_intersect_p(ts_bvh, jnp.asarray(o), jnp.asarray(d),
                              jnp.full((n,), 2.4, jnp.float32))
    np.testing.assert_array_equal(np.asarray(occ1), np.asarray(occ2))


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


def test_alpha_b8_tree_matches_brute():
    """Big alpha sets (> 512 tris) route through the 32-wide alpha tree +
    re-spawn retries (integrator._alpha_tree_closest/_anyhit); hits and
    occlusion must match the non-BVH brute retry path on stacked
    checkerboard cutout sheets."""
    rng = np.random.default_rng(7)
    b = SceneBuilder()
    floor = b.add_material(mtype=MAT_MATTE, kd=(0.8, 0.8, 0.8))
    leaf_m = b.add_material(mtype=MAT_MATTE, kd=(0.2, 0.8, 0.2))
    alpha = np.zeros((4, 4), np.float32)
    alpha[::2, ::2] = 1.0
    alpha[1::2, 1::2] = 1.0
    a_txd = b.add_texture_image(np.repeat(alpha[..., None], 3, -1))
    fpos = np.array([[-12, 0, -12], [12, 0, -12], [12, 0, 12], [-12, 0, 12]],
                    np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]])
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    b.add_mesh(fpos, idx, None, uv, floor)
    # 18x18 grid of masked quads on two stacked sheets -> 648 alpha tris
    for gy, height in ((0, 1.0), (1, 1.55)):
        for i in range(18):
            for j in range(9):
                cx = -9.0 + i + 0.3 * gy
                cz = -9.0 + 2 * j + 0.2 * gy
                q = np.array([[cx, height, cz], [cx + 1, height, cz],
                              [cx + 1, height, cz + 1], [cx, height, cz + 1]],
                             np.float32)
                b.add_mesh(q, idx, None, uv, leaf_m, alpha_txd=a_txd)
    sd = b.build()
    ts_tree = TracedScene.create(sd)
    assert ts_tree.bwa_rows is not None, "alpha set must route to the tree"
    ts_brute = TracedScene.create(sd, use_bvh=False, use_pallas=False)

    n = 128
    o = jnp.asarray(np.stack([rng.uniform(-8, 8, n),
                              np.full(n, 3.0),
                              rng.uniform(-8, 8, n)], -1), jnp.float32)
    d = jnp.asarray(np.tile([0.0, -1.0, 0.0], (n, 1)), jnp.float32)
    t_inf = jnp.full((n,), np.inf, jnp.float32)
    h_t = _scene_intersect(ts_tree, o, d, t_inf)
    h_b = _scene_intersect(ts_brute, o, d, t_inf)
    np.testing.assert_array_equal(np.asarray(h_t["valid"]),
                                  np.asarray(h_b["valid"]))
    np.testing.assert_array_equal(np.asarray(h_t["tri"]),
                                  np.asarray(h_b["tri"]))
    # shadow feelers from the floor up through the sheets
    o2 = jnp.asarray(np.stack([rng.uniform(-8, 8, n),
                               np.full(n, 0.01),
                               rng.uniform(-8, 8, n)], -1), jnp.float32)
    d2 = jnp.asarray(np.tile([0.0, 1.0, 0.0], (n, 1)), jnp.float32)
    t2 = jnp.full((n,), 5.0, jnp.float32)
    p_t = _scene_intersect_p(ts_tree, o2, d2, t2)
    p_b = _scene_intersect_p(ts_brute, o2, d2, t2)
    np.testing.assert_array_equal(np.asarray(p_t), np.asarray(p_b))
