"""Stratified/random sampler statistics tests (ref sampler/stratified.rs)."""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.ops import samplers as smp


def test_permute_pow2_is_bijection():
    for log2_n in range(0, 7):
        n = 1 << log2_n
        idx = jnp.arange(n, dtype=jnp.uint32)
        key = jnp.full((n,), 12345, jnp.uint32)
        out = np.asarray(smp._permute_pow2(idx, log2_n, key))
        assert sorted(out.tolist()) == list(range(n)), log2_n


def test_stratified_covers_all_strata():
    spp_log2 = 4  # 16 spp
    ph = jnp.full((8,), 777, jnp.uint32)
    strata = set()
    for frame in range(16):
        v = np.asarray(smp.stratified_sample_dim(ph, frame, spp_log2, 3))
        assert (v >= 0).all() and (v < 1).all()
        # all lanes of one pixel-hash get the same stratum
        s = int(v[0] * 16)
        assert np.all((v * 16).astype(int) == s)
        strata.add(s)
    assert strata == set(range(16))


def test_stratified_decorrelated_across_dims():
    ph = jnp.full((1,), 42, jnp.uint32)
    seq_a = [int(np.asarray(smp.stratified_sample_dim(ph, f, 3, 5))[0] * 8)
             for f in range(8)]
    seq_b = [int(np.asarray(smp.stratified_sample_dim(ph, f, 3, 6))[0] * 8)
             for f in range(8)]
    assert seq_a != seq_b  # different permutations per dimension


def test_stratified_2d_pairs_tile_grid():
    """Pairs drawn via stratified_sample_dim2 occupy every cell of the
    nx x ny grid exactly once over a pixel's spp samples — the property
    stratified_sample_2d + shuffle guarantees (sampling.rs:20-58)."""
    for spp_log2, nx, ny in ((4, 4, 4), (3, 4, 2)):
        spp = 1 << spp_log2
        ph = jnp.asarray([777, 1234], jnp.uint32)
        cells = [set(), set()]
        for frame in range(spp):
            v = np.asarray(smp.stratified_sample_dim2(ph, frame, spp_log2, 3))
            assert (v >= 0).all() and (v < 1).all()
            for lane in range(2):
                cx, cy = int(v[lane, 0] * nx), int(v[lane, 1] * ny)
                cells[lane].add((cx, cy))
        for lane in range(2):
            assert cells[lane] == {(x, y) for x in range(nx)
                                   for y in range(ny)}, (spp_log2, lane)


def test_permute_general_is_bijection():
    for n in (2, 3, 5, 7, 12, 100):
        idx = jnp.arange(n, dtype=jnp.uint32)
        key = jnp.full((n,), 9876, jnp.uint32)
        out = np.asarray(smp.permute_general(idx, n, key))
        assert sorted(out.tolist()) == list(range(n)), n


def test_lhs_2d_latin_property():
    """The n array points of one pixel sample hit each x stratum and each
    y stratum exactly once (latin_hyper_cube_2d, sampling.rs:60-82)."""
    for n in (3, 5, 8):
        ph = jnp.asarray([42, 999], jnp.uint32)
        for frame in (0, 7):
            pts = np.stack([np.asarray(smp.lhs_2d_dim(ph, frame, 11, i, n))
                            for i in range(n)])  # (n, lanes, 2)
            for lane in range(2):
                xs = sorted((pts[:, lane, 0] * n).astype(int).tolist())
                ys = sorted((pts[:, lane, 1] * n).astype(int).tolist())
                assert xs == list(range(n)), (n, frame, lane)
                assert ys == list(range(n)), (n, frame, lane)


def test_random_sampler_uniform():
    ph = jnp.arange(4096, dtype=jnp.uint32)
    v = np.asarray(smp.random_sample_dim(ph, 0, 9))
    assert 0.45 < v.mean() < 0.55
    assert (v >= 0).all() and (v < 1).all()


def test_render_with_each_sampler():
    from pathtracer_tpu.integrator import PathConfig, PathIntegrator
    from pathtracer_tpu.scene.mitsuba import load_mitsuba
    cam, sd, _ = load_mitsuba("data/cornell-box.xml", resolution=(24, 24))
    means = {}
    for sampler in ("sobol", "stratified", "random"):
        cfg = PathConfig(max_depth=3, sampler=sampler)
        film = PathIntegrator(cfg, spp=4).render(cam, sd)
        rgb = np.asarray(film[..., :3] / np.maximum(
            np.asarray(film[..., 3:4]), 1e-9))
        assert np.isfinite(rgb).all(), sampler
        means[sampler] = rgb.mean()
    # all samplers estimate the same integral
    vals = list(means.values())
    assert max(vals) / min(vals) < 1.25, means
