"""BVH-vs-brute-force equality on random ray sets (SURVEY §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer_tpu.accel.bvh import build_bvh, bvh_intersect
from pathtracer_tpu.ops.pallas.intersect_pl import pack_triangles
from pathtracer_tpu.integrator import TracedScene
from pathtracer_tpu.ops.intersect import intersect_brute, intersect_p_brute
from pathtracer_tpu.scene.mitsuba import load_mitsuba


@pytest.fixture(scope="module")
def cornell_bvh():
    _, sd, _ = load_mitsuba("data/cornell-box.xml", resolution=(32, 32))
    return TracedScene.create(sd, use_bvh=True)


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    o[:, 1] += 1.0  # inside the box
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_bvh_closest_matches_brute(cornell_bvh):
    ts = cornell_bvh
    n = 2048
    o, d = _random_rays(n)
    tmax = jnp.full(n, np.inf, jnp.float32)
    hb = intersect_brute(o, d, tmax, ts.data.p0, ts.data.p1, ts.data.p2)
    hv = bvh_intersect(ts.bvh, ts.tri_pack, o, d, tmax)
    np.testing.assert_array_equal(np.asarray(hb["valid"]),
                                  np.asarray(hv["valid"]))
    both = np.asarray(hb["valid"])
    # same watertight math; XLA may fuse FMAs differently per call site,
    # and exact-t ties can resolve to a different coplanar triangle
    np.testing.assert_allclose(np.asarray(hb["t"])[both],
                               np.asarray(hv["t"])[both], rtol=1e-4,
                               atol=1e-6)
    # triangle ids may differ only on exact-t ties (coplanar shared edges)
    tri_agree = (np.asarray(hb["tri"])[both] ==
                 np.asarray(hv["tri"])[both]).mean()
    assert tri_agree > 0.99


def test_bvh_any_hit_matches_brute(cornell_bvh):
    ts = cornell_bvh
    n = 1024
    o, d = _random_rays(n, seed=5)
    tmax = jnp.full(n, 1.5, jnp.float32)
    pb = intersect_p_brute(o, d, tmax, ts.data.p0, ts.data.p1, ts.data.p2)
    pv = bvh_intersect(ts.bvh, ts.tri_pack, o, d, tmax, any_hit=True)
    np.testing.assert_array_equal(np.asarray(pb), np.asarray(pv))


def test_bvh_build_structure():
    rng = np.random.default_rng(1)
    f = 500
    base = rng.uniform(-5, 5, (f, 3)).astype(np.float32)
    p0 = base
    p1 = base + rng.normal(0, 0.2, (f, 3)).astype(np.float32)
    p2 = base + rng.normal(0, 0.2, (f, 3)).astype(np.float32)
    bvh = build_bvh(p0, p1, p2, max_prims=4)
    n_prims = np.asarray(bvh.n_prims)
    offset = np.asarray(bvh.offset)
    # every triangle appears exactly once across leaves
    assert sorted(np.asarray(bvh.order).tolist()) == list(range(f))
    leaves = n_prims > 0
    assert n_prims[leaves].max() <= 4
    assert n_prims[leaves].sum() == f
    # interior offsets point forward (DFS layout)
    interior = ~leaves
    assert (offset[interior] > np.nonzero(interior)[0]).all()


def test_bvh_degenerate_centroids_split_not_leaf():
    """Coincident centroids must split (equal-count), never emit a leaf
    larger than max_leaf — traversal only tests max_leaf prims per leaf."""
    rng = np.random.default_rng(7)
    f = 6
    p0 = rng.uniform(-1, 1, (f, 3)).astype(np.float32)
    p1 = rng.uniform(-1, 1, (f, 3)).astype(np.float32)
    p2 = (-(p0 + p1)).astype(np.float32)  # every centroid is exactly 0
    for native in (False, True):
        if native:
            from pathtracer_tpu.accel import cpp
            if not cpp.available():
                continue
        bvh = build_bvh(p0, p1, p2, max_prims=4, native=native)
        n_prims = np.asarray(bvh.n_prims)
        assert n_prims.max() <= 4, f"native={native}"
        assert sorted(np.asarray(bvh.order).tolist()) == list(range(f))
        # rays at each triangle's interior must hit via BVH as via brute
        sp0, sp1, sp2 = p0[bvh.order], p1[bvh.order], p2[bvh.order]
        q = (0.6 * p0 + 0.3 * p1 + 0.1 * p2).astype(np.float32)
        o = np.tile(np.array([[3.0, 4.0, 5.0]], np.float32), (f, 1))
        d = q - o
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o, d = jnp.asarray(o), jnp.asarray(d)
        tmax = jnp.full(f, np.inf, jnp.float32)
        hb = intersect_brute(o, d, tmax, jnp.asarray(sp0), jnp.asarray(sp1),
                             jnp.asarray(sp2))
        hv = bvh_intersect(bvh, pack_triangles(jnp.asarray(sp0),
                                               jnp.asarray(sp1),
                                               jnp.asarray(sp2)),
                           o, d, tmax)
        np.testing.assert_array_equal(np.asarray(hb["valid"]),
                                      np.asarray(hv["valid"]))
        assert np.asarray(hv["valid"]).all()


def test_slab_test_on_plane_zero_direction():
    """Origin exactly on a slab plane with zero direction in that axis:
    0*inf = NaN must not cull the node (pbrt lets NaN comparisons pass)."""
    from pathtracer_tpu.accel.bvh import _slab_test
    bmin = jnp.asarray([[0.0, 0.0, 0.0]])
    bmax = jnp.asarray([[1.0, 1.0, 1.0]])
    o = jnp.asarray([[0.0, -1.0, 0.5]])  # on the x=bmin plane
    d = np.array([[0.0, 1.0, 0.0]], np.float32)
    inv_d = jnp.asarray(1.0 / d)
    hit = _slab_test(bmin, bmax, o, inv_d, jnp.asarray([np.inf]))
    assert bool(np.asarray(hit)[0])
    # also from the max plane
    o2 = jnp.asarray([[1.0, -1.0, 0.5]])
    hit2 = _slab_test(bmin, bmax, o2, inv_d, jnp.asarray([np.inf]))
    assert bool(np.asarray(hit2)[0])
    # a genuinely outside parallel ray must still miss
    o3 = jnp.asarray([[2.0, -1.0, 0.5]])
    hit3 = _slab_test(bmin, bmax, o3, inv_d, jnp.asarray([np.inf]))
    assert not bool(np.asarray(hit3)[0])


