"""Watertight intersection tests: against an independent Möller-Trumbore
oracle on random ray/triangle sets (SURVEY §4: BVH-vs-brute-force equality
strategy; here brute-force-vs-oracle)."""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.ops.intersect import intersect_brute, intersect_p_brute


def moller_trumbore(o, d, v0, v1, v2, eps=1e-9):
    """Scalar-ish numpy closest-hit oracle. Returns (t, hit)."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = np.cross(d[:, None, :], e2[None, :, :])
    det = np.einsum("fk,nfk->nf", e1, p)
    ok = np.abs(det) > eps
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    s = o[:, None, :] - v0[None, :, :]
    u = np.einsum("nfk,nfk->nf", s, p) * inv
    q = np.cross(s, e1[None, :, :])
    v = np.einsum("nk,nfk->nf", d, q) * inv
    t = np.einsum("fk,nfk->nf", e2, q) * inv
    hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
    t = np.where(hit, t, np.inf)
    return t.min(axis=1), hit.any(axis=1)


def random_scene(rng, f=32):
    base = rng.uniform(-1, 1, (f, 3)).astype(np.float32)
    v0 = base
    v1 = base + rng.normal(0, 0.5, (f, 3)).astype(np.float32)
    v2 = base + rng.normal(0, 0.5, (f, 3)).astype(np.float32)
    return v0, v1, v2


def test_brute_force_matches_oracle():
    rng = np.random.default_rng(42)
    v0, v1, v2 = random_scene(rng)
    n = 256
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    hit = intersect_brute(jnp.asarray(o), jnp.asarray(d),
                          jnp.full(n, np.inf, np.float32),
                          jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
    t_ref, hit_ref = moller_trumbore(o.astype(np.float64),
                                     d.astype(np.float64),
                                     v0.astype(np.float64),
                                     v1.astype(np.float64),
                                     v2.astype(np.float64))
    got_valid = np.asarray(hit["valid"])
    got_t = np.asarray(hit["t"])
    # allow disagreement only for grazing hits where t differs meaningfully
    agree = got_valid == hit_ref
    assert agree.mean() > 0.98, f"hit/miss agreement {agree.mean()}"
    both = got_valid & hit_ref
    rel = np.abs(got_t[both] - t_ref[both]) / np.maximum(t_ref[both], 1e-6)
    assert np.quantile(rel, 0.98) < 1e-3


def test_t_max_clipping():
    v0 = np.array([[-1, -1, -2]], np.float32)
    v1 = np.array([[1, -1, -2]], np.float32)
    v2 = np.array([[0, 1, -2]], np.float32)
    o = np.zeros((1, 3), np.float32)
    d = np.array([[0, 0, -1]], np.float32)
    near = intersect_brute(jnp.asarray(o), jnp.asarray(d),
                           jnp.asarray([1.0], ), jnp.asarray(v0),
                           jnp.asarray(v1), jnp.asarray(v2))
    far = intersect_brute(jnp.asarray(o), jnp.asarray(d),
                          jnp.asarray([3.0]), jnp.asarray(v0),
                          jnp.asarray(v1), jnp.asarray(v2))
    assert not bool(near["valid"][0])
    assert bool(far["valid"][0])
    assert abs(float(far["t"][0]) - 2.0) < 1e-5


def test_any_hit_matches_closest():
    rng = np.random.default_rng(7)
    v0, v1, v2 = random_scene(rng, 16)
    n = 128
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.full(n, np.inf, np.float32)
    closest = intersect_brute(jnp.asarray(o), jnp.asarray(d), tmax,
                              jnp.asarray(v0), jnp.asarray(v1),
                              jnp.asarray(v2))
    any_hit = intersect_p_brute(jnp.asarray(o), jnp.asarray(d), tmax,
                                jnp.asarray(v0), jnp.asarray(v1),
                                jnp.asarray(v2))
    np.testing.assert_array_equal(np.asarray(closest["valid"]),
                                  np.asarray(any_hit))
