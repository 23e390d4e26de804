"""BVH8 (accel/bvh8) equality vs the brute-force watertight oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.accel.bvh8 import build_bvh8, bvh8_intersect
from pathtracer_tpu.ops.intersect import intersect_brute


def _random_soup(rng, f, spread=4.0, size=0.4):
    c = (rng.random((f, 1, 3)) * 2 - 1) * spread
    tri = c + (rng.random((f, 3, 3)) * 2 - 1) * size
    tri = tri.astype(np.float32)
    return tri[:, 0], tri[:, 1], tri[:, 2]


def _random_rays(rng, n, spread=6.0):
    o = ((rng.random((n, 3)) * 2 - 1) * spread).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("f", [1, 5, 37, 600])
def test_bvh8_matches_brute(f):
    rng = np.random.default_rng(f)
    p0, p1, p2 = _random_soup(rng, f)
    table, order, depth = build_bvh8(p0, p1, p2)
    p0r, p1r, p2r = p0[order], p1[order], p2[order]
    o, d = _random_rays(rng, 512)
    tmax = jnp.full((512,), jnp.inf, jnp.float32)

    hv = bvh8_intersect(jnp.asarray(table), o, d, tmax)
    hb = intersect_brute(o, d, tmax, jnp.asarray(p0r), jnp.asarray(p1r),
                         jnp.asarray(p2r))
    np.testing.assert_array_equal(np.asarray(hv["valid"]),
                                  np.asarray(hb["valid"]))
    v = np.asarray(hb["valid"])
    np.testing.assert_allclose(np.asarray(hv["t"])[v],
                               np.asarray(hb["t"])[v], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(hv["tri"])[v],
                                  np.asarray(hb["tri"])[v])

    # any-hit with finite t_max agrees on occlusion
    tb = jnp.where(hb["valid"], hb["t"] * 1.5, 0.5)
    pv = bvh8_intersect(jnp.asarray(table), o, d, tb, any_hit=True)
    pb = intersect_brute(o, d, tb, jnp.asarray(p0r), jnp.asarray(p1r),
                         jnp.asarray(p2r))["valid"]
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(pb))


def test_bvh8_dead_lanes_terminate():
    """t_max <= 0 lanes must report no hit (compaction contract)."""
    rng = np.random.default_rng(7)
    p0, p1, p2 = _random_soup(rng, 50)
    table, _, _ = build_bvh8(p0, p1, p2)
    o, d = _random_rays(rng, 64)
    hv = bvh8_intersect(jnp.asarray(table), o, d,
                        jnp.zeros((64,), jnp.float32))
    assert not np.asarray(hv["valid"]).any()
