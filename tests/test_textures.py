"""Texture pool + descriptor evaluation tests (ref texture.rs)."""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.scene.scene import MAT_MATTE, SceneBuilder
from pathtracer_tpu.scene.texture import (WRAP_CLAMP, WRAP_REPEAT,
                                          TexturePoolBuilder, build_pyramid,
                                          lookup_width)
from pathtracer_tpu.ops.bsdf import eval_texture


def test_pyramid_structure():
    img = np.random.default_rng(0).random((7, 5, 3)).astype(np.float32)
    levels = build_pyramid(img)
    assert levels[0].shape == (8, 8, 3)  # pow2 resample
    assert levels[-1].shape == (1, 1, 3)
    assert len(levels) == 4
    # box filter preserves the mean approximately
    np.testing.assert_allclose(levels[-1][0, 0], levels[0].mean((0, 1)),
                               rtol=1e-4)


def test_pool_lookup_bilinear():
    img = np.zeros((4, 4, 3), np.float32)
    img[:, 2:, :] = 1.0  # right half white
    b = TexturePoolBuilder()
    tid = b.add(img, WRAP_CLAMP)
    pool = b.build()
    tex = jnp.zeros(3, jnp.int32) + tid
    st = jnp.asarray([[0.125, 0.5], [0.875, 0.5], [0.5, 0.5]], jnp.float32)
    v = np.asarray(lookup_width(pool, tex, st, 0.0))
    assert v[0, 0] < 0.01  # left: black
    assert v[1, 0] > 0.99  # right: white
    assert 0.4 < v[2, 0] < 0.6  # seam: blend


def test_pool_lookup_coarsest_level_is_mean():
    rng = np.random.default_rng(1)
    img = rng.random((8, 8, 3)).astype(np.float32)
    b = TexturePoolBuilder()
    tid = b.add(img, WRAP_REPEAT)
    pool = b.build()
    tex = jnp.zeros(1, jnp.int32) + tid
    st = jnp.asarray([[0.3, 0.7]], jnp.float32)
    v = np.asarray(lookup_width(pool, tex, st, 10.0))  # huge width → 1x1
    np.testing.assert_allclose(v[0], img.mean((0, 1)), rtol=1e-4)


def _scene_with(builder_fn):
    b = SceneBuilder()
    txd = builder_fn(b)
    b.add_material(mtype=MAT_MATTE, kd=(0.1, 0.1, 0.1), kd_tx=txd)
    b.add_mesh(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
               np.array([[0, 1, 2]]), None, None, 0)
    return b.build()


def test_checker_descriptor():
    scene = _scene_with(lambda b: b.add_texture_checker(
        (1, 0, 0), (0, 1, 0), uv=(2, 2, 0, 0)))
    uv = jnp.asarray([[0.1, 0.1], [0.6, 0.1], [0.6, 0.6]], jnp.float32)
    txd = jnp.zeros(3, jnp.int32)
    v = np.asarray(eval_texture(scene, txd, uv, jnp.zeros((3, 3))))
    # uv scaled by 2: cells flip every 0.5
    np.testing.assert_allclose(v[0], [1, 0, 0])  # (0,0) cell
    np.testing.assert_allclose(v[1], [0, 1, 0])  # (1,0) cell
    np.testing.assert_allclose(v[2], [1, 0, 0])  # (1,1) cell


def test_image_descriptor_with_channel_and_scale():
    img = np.zeros((4, 4, 3), np.float32)
    img[..., 1] = 0.5  # green channel constant
    b = SceneBuilder()
    txd = b.add_texture_image(img, scale=(2.0, 2.0, 2.0), channel=1)
    b.add_material(mtype=MAT_MATTE, kd_tx=txd)
    b.add_mesh(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
               np.array([[0, 1, 2]]), None, None, 0)
    scene = b.build()
    uv = jnp.asarray([[0.5, 0.5]], jnp.float32)
    v = np.asarray(eval_texture(scene, jnp.zeros(1, jnp.int32), uv,
                                jnp.zeros((1, 3))))
    np.testing.assert_allclose(v[0], [1.0, 1.0, 1.0], rtol=1e-5)


def test_fallback_for_unbound():
    scene = _scene_with(lambda b: b.add_texture_checker((1, 0, 0), (0, 1, 0)))
    uv = jnp.asarray([[0.5, 0.5]], jnp.float32)
    fb = jnp.asarray([[0.7, 0.8, 0.9]], jnp.float32)
    v = np.asarray(eval_texture(scene, jnp.full(1, -1, jnp.int32), uv, fb))
    np.testing.assert_allclose(v[0], [0.7, 0.8, 0.9])


def test_textured_render_smoke():
    """Cornell with a checkered floor renders finite and shows variation."""
    from pathtracer_tpu.integrator import PathConfig, PathIntegrator
    from pathtracer_tpu.scene import meshgen
    b = SceneBuilder()
    txd = b.add_texture_checker((0.9, 0.1, 0.1), (0.1, 0.1, 0.9),
                                uv=(4, 4, 0, 0))
    floor = b.add_material(mtype=MAT_MATTE, kd_tx=txd)
    pos, idx, nrm, _ = meshgen.gen_rectangle()
    m = np.asarray([[3, 0, 0, 0], [0, 0, 3, 0], [0, 3, 0, 0], [0, 0, 0, 1.0]])
    # plane normal +z → +y: rows map local axes
    m = np.asarray([[3, 0, 0, 0], [0, 0, 1, 0], [0, 3, 0, 0], [0, 0, 0, 1.0]])
    p, n = meshgen.transform_mesh(pos, nrm, m)
    b.add_mesh(p, idx, n, np.array([[0, 0], [1, 0], [1, 1], [0, 1]],
                                   np.float32), floor)
    b.add_point_light((0, 4, 0), (40, 40, 40))
    from pathtracer_tpu.core.camera import Camera
    cam = Camera.look_at([0, 3, 5], [0, 0, 0], [0, 1, 0], np.pi / 3,
                         (32, 32))
    film = PathIntegrator(PathConfig(max_depth=1), spp=2).render(
        cam, b.build())
    rgb = np.asarray(film[..., :3] / np.maximum(np.asarray(film[..., 3:4]),
                                                1e-9))
    assert np.isfinite(rgb).all()
    lit = rgb[rgb.sum(-1) > 0.01]
    assert len(lit) > 50
    # both checker colors visible: some red-dominant, some blue-dominant
    assert (lit[:, 0] > 2 * lit[:, 2]).any()
    assert (lit[:, 2] > 2 * lit[:, 0]).any()


def test_normal_mapping_tilts_shading():
    """A normal map tilting all normals changes the cosine falloff
    (NormalMaterial parity, material/mod.rs:39-78)."""
    import jax.numpy as jnp
    from pathtracer_tpu.ops.interaction import (apply_normal_mapping,
                                                make_interaction)
    from pathtracer_tpu.ops.intersect import intersect_brute
    from pathtracer_tpu.integrator import TracedScene

    def build(with_map):
        b = SceneBuilder()
        if with_map:
            # constant normal map tilting 45 deg toward +u
            nm = np.zeros((2, 2, 3), np.float32)
            nm[...] = [0.5 + 0.3535, 0.5, 0.8535]  # (0.707,0,0.707)/2+0.5
            tx = b.add_texture_image(nm)
            mat = b.add_material(mtype=MAT_MATTE, normal_tx=tx)
        else:
            mat = b.add_material(mtype=MAT_MATTE)
        pos = np.array([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]],
                       np.float32)
        idx = np.array([[0, 1, 2], [0, 2, 3]])
        nrm = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
        b.add_mesh(pos, idx, nrm,
                   np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
                   mat)
        return b.build()

    o = jnp.asarray([[0.2, 2.0, 0.1]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    tmax = jnp.asarray([np.inf], jnp.float32)

    for with_map, want_tilt in [(False, False), (True, True)]:
        sd = build(with_map)
        hit = intersect_brute(o, d, tmax, sd.p0, sd.p1, sd.p2)
        from pathtracer_tpu.scene.scene import pack_tri_attr
        it = make_interaction(sd, o, d, hit, pack_tri_attr(sd))
        it = apply_normal_mapping(sd, it)
        ns = np.asarray(it["ns"])[0]
        if want_tilt:
            assert abs(ns[1] - 0.707) < 0.02 and abs(abs(ns[0]) - 0.707) < 0.05, ns
        else:
            np.testing.assert_allclose(ns, [0, 1, 0], atol=1e-5)
        # frame stays orthonormal
        ss, ts = np.asarray(it["ss"])[0], np.asarray(it["ts"])[0]
        assert abs(np.dot(ss, ns)) < 1e-4 and abs(np.dot(ts, ns)) < 1e-4
        assert abs(np.dot(ss, ts)) < 1e-4


def test_compute_duv_scales_with_distance():
    """Screen-space UV derivatives grow linearly with hit distance
    (interaction.rs:216-281 plane projection)."""
    import jax.numpy as jnp
    from pathtracer_tpu.ops.interaction import compute_duv, make_interaction
    from pathtracer_tpu.ops.intersect import intersect_brute
    from pathtracer_tpu.scene.scene import pack_tri_attr

    b = SceneBuilder()
    mat = b.add_material()
    pos = np.array([[-9, 0, -9], [9, 0, -9], [9, 0, 9], [-9, 0, 9]],
                   np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]])
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    b.add_mesh(pos, idx, None, uv, mat)
    sd = b.build()
    ta = pack_tri_attr(sd)

    def duv_at(height):
        o = jnp.asarray([[0.3, height, 0.2]], jnp.float32)
        d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
        # auxiliary rays tilted by ~1/1000 per raster step
        eps = 1e-3
        rxd = jnp.asarray([[eps, -1.0, 0.0]], jnp.float32)
        ryd = jnp.asarray([[0.0, -1.0, eps]], jnp.float32)
        rxd = rxd / jnp.linalg.norm(rxd)
        ryd = ryd / jnp.linalg.norm(ryd)
        hit = intersect_brute(o, d, jnp.asarray([np.inf], jnp.float32),
                              sd.p0, sd.p1, sd.p2)
        assert bool(np.asarray(hit["valid"])[0])
        it = make_interaction(sd, o, d, hit, ta)
        dudx, dvdx, dudy, dvdy = compute_duv(it, o, rxd, ryd)
        return np.asarray(dudx)[0], np.asarray(dvdy)[0]

    du2, dv2 = duv_at(2.0)
    du4, dv4 = duv_at(4.0)
    assert du2 != 0.0 and dv2 != 0.0
    np.testing.assert_allclose(du4 / du2, 2.0, rtol=0.05)
    np.testing.assert_allclose(dv4 / dv2, 2.0, rtol=0.05)
    # plane spans 18 world units / 1 uv unit; at h=2 the x-step is
    # eps*2 world => dudx ~ 2e-3/18
    np.testing.assert_allclose(abs(du2), 2e-3 / 18.0, rtol=0.05)


def test_mip_level_varies_with_filter_width():
    """eval_texture picks coarser mips for wider footprints: a checker
    image converges to its mean when the width covers many texels
    (texture.rs:430-464 trilinear lookup)."""
    import jax.numpy as jnp
    from pathtracer_tpu.ops.bsdf import eval_texture

    b = SceneBuilder()
    img = np.zeros((64, 64, 3), np.float32)
    img[::2, :] = [1, 0, 0]
    img[1::2, :] = [0, 0, 1]
    tx = b.add_texture_image(img)
    b.add_material(kd_tx=tx)
    pos = np.array([[-1, 0, -1], [1, 0, -1], [1, 0, 1]], np.float32)
    b.add_mesh(pos, np.array([[0, 1, 2]]), None, None, 0)
    sd = b.build()

    uv = jnp.asarray([[0.25, 16.5 / 64.0]], jnp.float32)  # texel-centered
    txid = jnp.asarray([tx], jnp.int32)
    fb = jnp.zeros((1, 3), jnp.float32)
    zeros = jnp.zeros((1,), jnp.float32)

    near = np.asarray(eval_texture(sd, txid, uv, fb,
                                   duv=(zeros, zeros, zeros, zeros)))[0]
    wide = jnp.full((1,), 0.5, jnp.float32)
    far = np.asarray(eval_texture(sd, txid, uv, fb,
                                  duv=(wide, zeros, zeros, wide)))[0]
    # near: a saturated stripe color; far: the 50/50 mean (0.5, 0, 0.5)
    assert abs(near[0] - near[2]) > 0.9
    np.testing.assert_allclose(far, [0.5, 0.0, 0.5], atol=0.05)


def test_tex_channel_gating():
    """TracedScene.tex_channels reflects which channels any USED material
    binds (unbound channels compile out of gather_params), and a gated
    build still evaluates the bound channel."""
    import jax.numpy as jnp
    from pathtracer_tpu.integrator import TracedScene
    from pathtracer_tpu.ops.bsdf import gather_params
    img = np.zeros((4, 4, 3), np.float32)
    img[:, :2] = 1.0
    b = SceneBuilder()
    txd = b.add_texture_image(img)
    m = b.add_material(mtype=MAT_MATTE, kd=(0.5, 0.5, 0.5), kd_tx=txd)
    tri = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    b.add_mesh(tri, np.asarray([[0, 1, 2]]), None,
               np.asarray([[0, 0], [1, 0], [0, 1]], np.float32), m)
    ts = TracedScene.create(b.build(), use_pallas=False)
    assert ts.tex_channels == (True, False, False, False)
    assert ts.has_tex
    uv = jnp.asarray([[0.25, 0.5], [0.9, 0.5]], jnp.float32)
    mp = gather_params(ts.data, jnp.zeros(2, jnp.int32), uv,
                       mat_attr=ts.mat_attr, has_tex=ts.has_tex,
                       tex_channels=ts.tex_channels)
    kd = np.asarray(mp["kd"])
    assert kd[0, 0] > 0.9 and kd[1, 0] < 0.1  # texture applied
    # an unused ks texture on an UNUSED material must not enable the ks
    # channel (gating keys on used materials only)
    b2 = SceneBuilder()
    txd2 = b2.add_texture_image(img)
    m2 = b2.add_material(mtype=MAT_MATTE, kd=(0.5, 0.5, 0.5))
    b2.add_material(mtype=MAT_MATTE, ks_tx=txd2)  # never referenced
    b2.add_mesh(tri, np.asarray([[0, 1, 2]]), None,
                np.asarray([[0, 0], [1, 0], [0, 1]], np.float32), m2)
    ts2 = TracedScene.create(b2.build(), use_pallas=False)
    assert ts2.tex_channels == (False, False, False, False)
    assert not ts2.has_tex
