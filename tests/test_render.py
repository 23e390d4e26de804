"""End-to-end render regression + film/light invariants on tiny frames."""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer_tpu.core.film import add_samples, film_new, to_rgb
from pathtracer_tpu.core.filter import gaussian_filter_table
from pathtracer_tpu.integrator import PathConfig, PathIntegrator
from pathtracer_tpu.scene.mitsuba import load_mitsuba


@pytest.fixture(scope="module")
def cornell():
    return load_mitsuba("data/cornell-box.xml", resolution=(32, 32))


def test_film_splat_single_sample():
    """One sample at a pixel center spreads per the Gaussian table
    (ref film.rs:60-106 semantics)."""
    film = film_new(8, 8)
    table = jnp.asarray(gaussian_filter_table())
    p = jnp.asarray([[4.5, 4.5]])  # discrete position lands exactly on (4,4)
    l = jnp.asarray([[2.0, 0.0, 0.0]])
    film = add_samples(film, p, l, table)
    f = np.asarray(film)
    # center pixel gets the largest weight
    assert f[4, 4, 3] == f[:, :, 3].max() > 0
    # footprint is 4x4..5x5 for radius 2 at integer-centered sample
    assert (f[:, :, 3] > 0).sum() <= 25
    # normalizing returns the original radiance at the center
    rgb = np.asarray(to_rgb(film))
    np.testing.assert_allclose(rgb[4, 4], [2.0, 0, 0], rtol=1e-5)


def test_cornell_depth0_emitter_only(cornell):
    cam, scene, _ = cornell
    film = PathIntegrator(PathConfig(max_depth=0), spp=1).render(cam, scene)
    rgb = np.asarray(to_rgb(film))
    lit = rgb.sum(-1) > 0.05
    # only the ceiling light should be visible: small fraction of pixels
    assert 0 < lit.sum() < 0.2 * lit.size
    # emitted color ratio matches ke = (17,12,4)
    bright = rgb[rgb[..., 0] > 5.0]
    if len(bright):
        ratio = bright.mean(0) / np.array([17.0, 12.0, 4.0])
        assert ratio.std() / ratio.mean() < 0.05


def test_cornell_render_statistics(cornell):
    cam, scene, _ = cornell
    integ = PathIntegrator(PathConfig(max_depth=3), spp=4)
    film = integ.render(cam, scene)
    rgb = np.asarray(to_rgb(film))
    assert np.isfinite(rgb).all()
    mean = rgb.reshape(-1, 3).mean(0)
    # cornell under (17,12,4) light: warm average, nothing blown out
    assert 0.05 < mean[0] < 2.0
    assert mean[0] > mean[2]  # red-heavy light
    # left third redder than right third (red vs green walls)
    left = rgb[:, :10].reshape(-1, 3).mean(0)
    right = rgb[:, -10:].reshape(-1, 3).mean(0)
    assert left[0] / max(left[1], 1e-6) > right[0] / max(right[1], 1e-6)
    assert integ.last_ray_count > 0


def test_cornell_deterministic(cornell):
    cam, scene, _ = cornell
    cfg = PathConfig(max_depth=2)
    f1 = PathIntegrator(cfg, spp=2).render(cam, scene)
    f2 = PathIntegrator(cfg, spp=2).render(cam, scene)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_sharded_matches_single(cornell):
    import jax
    from pathtracer_tpu.parallel.mesh import make_mesh, render_sharded
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    cam, scene, _ = cornell
    cfg = PathConfig(max_depth=2)
    f1 = PathIntegrator(cfg, spp=1).render(cam, scene)
    f8 = render_sharded(cam, scene, make_mesh(len(jax.devices())), cfg, spp=1)
    # identical samples; only filter-splat accumulation order differs at
    # band boundaries → last-ulp tolerance
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f8),
                               rtol=0, atol=2e-5)


@pytest.mark.slow
def test_sharded_2d_mesh_matches_single(cornell):
    """(tiles=4, samples=2) mesh == single-chip render (VERDICT r1 item 10:
    the Config-E-class 2D scaling axis — bands x sample frames)."""
    import jax
    from pathtracer_tpu.parallel.mesh import make_mesh_2d, render_sharded
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cam, scene, _ = cornell
    cfg = PathConfig(max_depth=2)
    f1 = PathIntegrator(cfg, spp=2).render(cam, scene)
    f8 = render_sharded(cam, scene, make_mesh_2d(4, 2), cfg, spp=2)
    # identical samples; accumulation order differs across bands AND across
    # the two frame halves -> small absolute tolerance
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f8),
                               rtol=0, atol=5e-5)


@pytest.mark.slow
def test_sharded_segmented_sponza_matches_single():
    """Sharded SEGMENTED path (per-bounce programs under shard_map) ==
    single-chip render on the Sponza-class GLB (VERDICT r3 item 4: big
    scenes must shard through the segmented path so real multi-chip
    hardware can't hit the fused program's fault envelope)."""
    import jax
    from pathtracer_tpu.integrator import TracedScene
    from pathtracer_tpu.parallel.mesh import make_mesh, render_sharded
    from pathtracer_tpu.scene.gltf import load_gltf
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=(48, 24))
    scene = TracedScene.create(sd)
    cfg = PathConfig(max_depth=3, mis_mode="onesample")
    f1 = PathIntegrator(cfg, spp=1).render(cam, scene)
    f8 = render_sharded(cam, scene, make_mesh(len(jax.devices())), cfg,
                        spp=1, segmented=True)
    # fused single-chip vs segmented sharded are different XLA programs;
    # codegen variance drifts ~0.7% of channels by <=2e-4 (measured) —
    # far below any real traversal/shading regression (10%+ shifts)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f8),
                               rtol=1e-2, atol=2e-4)


@pytest.mark.slow
def test_sharded_segmented_2d_mesh_matches_single(cornell):
    """Segmented sharded path on a 2D (tiles x samples) mesh == single
    chip; forces segmentation on the small cornell tree to exercise the
    frame-slicing logic."""
    import jax
    from pathtracer_tpu.parallel.mesh import make_mesh_2d, render_sharded
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cam, scene, _ = cornell
    cfg = PathConfig(max_depth=2, mis_mode="onesample")
    f1 = PathIntegrator(cfg, spp=2).render(cam, scene)
    f8 = render_sharded(cam, scene, make_mesh_2d(4, 2), cfg, spp=2,
                        segmented=True)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f8),
                               rtol=0, atol=5e-5)


@pytest.mark.parametrize("kind", ["gaussian", "triangle", "lanczos"])
def test_splat_tile_matches_scatter_reference(kind):
    """Dense band splat == reference-semantics per-sample scatter
    (film.rs:60-106) for BOTH filter radii (gaussian r=2, triangle r=1)."""
    from pathtracer_tpu.core.film import (film_crop, film_pad_accumulate,
                                          film_pad_new, splat_halfwidth,
                                          splat_tile)
    from pathtracer_tpu.core.filter import filter_f1d, make_filter
    h = w = 6
    rng = np.random.default_rng(3)
    jx = rng.random((h, w)).astype(np.float32)
    jy = rng.random((h, w)).astype(np.float32)
    radiance = rng.random((h, w, 3)).astype(np.float32)
    f1d, radius = filter_f1d(kind)
    table, _ = make_filter(kind)

    tile = splat_tile(jnp.asarray(radiance), jnp.asarray(jx),
                      jnp.asarray(jy), jnp.ones((h, w), bool),
                      tuple(float(v) for v in f1d), radius=radius)
    fp = film_pad_new(w, h)
    fp = film_pad_accumulate(fp, tile, 0, 0, half=splat_halfwidth(radius))
    film_a = np.asarray(film_crop(fp, w, h))

    xs, ys = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    p = np.stack([xs + jx, ys + jy], -1).reshape(-1, 2).astype(np.float32)
    film_b = add_samples(film_new(w, h), jnp.asarray(p),
                         jnp.asarray(radiance.reshape(-1, 3)),
                         jnp.asarray(table), radius=radius,
                         footprint=2 * splat_halfwidth(radius) + 1)
    np.testing.assert_allclose(film_a, np.asarray(film_b),
                               rtol=1e-5, atol=1e-6)


def test_checkpoint_path_without_extension(tmp_path, cornell):
    """--checkpoint foo must save AND resume from foo.npz (np.savez
    appends the extension; the resume check must agree)."""
    cam, scene, _ = cornell
    ck = str(tmp_path / "ck_no_ext")
    integ = PathIntegrator(PathConfig(max_depth=1), spp=2)
    f1 = integ.render_progressive(cam, scene, chunk_spp=1, checkpoint=ck)
    assert (tmp_path / "ck_no_ext.npz").exists()
    integ2 = PathIntegrator(PathConfig(max_depth=1), spp=2)
    f2 = integ2.render_progressive(cam, scene, chunk_spp=1, checkpoint=ck)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    assert integ2.last_ray_count == 0.0  # resumed at next_frame == spp


@pytest.mark.slow
def test_all_lights_strategy_matches_one_light_mean(cornell):
    """uniform_sample_all_lights (integrator.rs:141-189) converges to the
    same direct lighting as one-light sampling x n_lights."""
    cam, scene, _ = cornell
    f_one = PathIntegrator(PathConfig(max_depth=1,
                                      light_strategy="one"),
                           spp=64).render(cam, scene)
    f_all = PathIntegrator(PathConfig(max_depth=1,
                                      light_strategy="all"),
                           spp=16).render(cam, scene)
    r_one = np.asarray(to_rgb(f_one))
    r_all = np.asarray(to_rgb(f_all))
    assert np.isfinite(r_all).all()
    # same expectation: per-image means within MC noise
    np.testing.assert_allclose(r_all.mean((0, 1)), r_one.mean((0, 1)),
                               rtol=0.05)


def test_bounce_occupancy_counters(cornell):
    """Wavefront queue-occupancy: bounce 0 counts every lane once per
    frame; deeper bounces only lose lanes (escape/absorb/RR)."""
    cam, scene, _ = cornell
    integ = PathIntegrator(PathConfig(max_depth=4, count_occupancy=True),
                           spp=2)
    integ.render(cam, scene)
    occ = integ.bounce_occupancy
    assert occ.shape == (5,)
    # every pixel lane (incl. filter-pad border) traced twice at bounce 0
    assert occ[0] > 0 and occ[0] == occ.max()
    assert (np.diff(occ) <= 0).all()
    # the total matches the primary-ray share of last_ray_count
    assert occ.sum() <= integ.last_ray_count


def test_onesample_mis_matches_ref_mean(cornell):
    """The pbrt-v4-style onesample estimator (continuation ray = MIS BSDF
    branch) must converge to the same radiance as the reference-faithful
    dual-branch estimator."""
    cam, scene, _ = cornell
    f_ref = PathIntegrator(PathConfig(max_depth=3, mis_mode="ref"),
                           spp=32).render(cam, scene)
    f_one = PathIntegrator(PathConfig(max_depth=3, mis_mode="onesample"),
                           spp=32).render(cam, scene)
    r_ref = np.asarray(to_rgb(f_ref))
    r_one = np.asarray(to_rgb(f_one))
    assert np.isfinite(r_one).all()
    np.testing.assert_allclose(r_one.mean((0, 1)), r_ref.mean((0, 1)),
                               rtol=0.05)
    # per-pixel agreement within MC noise at 32 spp
    rel = np.abs(r_one - r_ref).mean() / max(r_ref.mean(), 1e-6)
    assert rel < 0.25, rel


def test_segmented_band_matches_unrolled(cornell, monkeypatch):
    """The segmented band renderer (per-bounce jitted programs,
    integrator._band_segmented) must produce the same film as the fused
    whole-wave program — it is the same _wave_bounce math dispatched
    differently. Forced on the small scene by shrinking the envelope."""
    import pathtracer_tpu.integrator as intg
    from pathtracer_tpu.integrator import TracedScene
    cam, sd, _ = cornell
    scene = TracedScene.create(sd, use_bvh=True, use_pallas=False)
    assert scene.bw_rows is not None
    cfgs = [PathConfig(max_depth=3),
            # onesample additionally exercises the deferred-shadow path
            # (the segmented renderer resolves bounce k's NEE occlusion
            # inside bounce k+1's program)
            PathConfig(max_depth=3, mis_mode="onesample")]
    f_unrolled = [np.asarray(PathIntegrator(c, spp=2).render(cam, scene))
                  for c in cfgs]
    monkeypatch.setattr(intg, "_WAVE_DEPTH_BUDGET", 1)
    monkeypatch.setattr(intg, "_SEG_MIN_ROWS", 1)
    for c, f_u in zip(cfgs, f_unrolled):
        f_seg = PathIntegrator(c, spp=2).render(cam, scene)
        np.testing.assert_allclose(np.asarray(f_seg), f_u,
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=c.mis_mode)


def test_sorted_waves_match_unsorted(cornell, monkeypatch):
    """The per-bounce cost sort (argsort by previous traversal steps +
    inverse permutation, integrator._wave_bounce) must not change the
    film — only the lane order inside the traversal."""
    import pathtracer_tpu.integrator as intg
    from pathtracer_tpu.integrator import TracedScene
    cam, sd, _ = cornell
    scene = TracedScene.create(sd, use_bvh=True, use_pallas=False)
    cfg = PathConfig(max_depth=3)
    f_plain = np.asarray(PathIntegrator(cfg, spp=2).render(cam, scene))
    monkeypatch.setattr(intg, "_SORT_MIN_ROWS", 1)
    f_sorted = np.asarray(PathIntegrator(cfg, spp=2).render(cam, scene))
    np.testing.assert_allclose(f_sorted, f_plain, rtol=2e-4, atol=2e-5)
