"""Sobol sampler parity tests.

The device implementation (bit-matrix XOR over u32, pathtracer_tpu/ops/sobol.py)
is checked against an independent scalar Python transcription of the reference
algorithm (ref src/pathtracer/lowdiscrepancy.rs:9-57, sampler/sobol.rs:81-193).
"""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.ops import sobol as dsobol

_T = dsobol._load_tables()
SM32 = _T["sm32"]
VDC = _T["vdc"]
VDC_INV = _T["vdc_inv"]


def ref_sobol_interval_to_index(m: int, frame: int, px: int, py: int) -> int:
    if m == 0:
        return 0
    m2 = m << 1
    index = frame << m2
    delta = 0
    c = 0
    f = frame
    while f != 0:
        if f & 1:
            delta ^= int(VDC[m - 1][c])
        f >>= 1
        c += 1
    b = ((px << m) | py) ^ delta
    c = 0
    while b != 0:
        if b & 1:
            index ^= int(VDC_INV[m - 1][c])
        b >>= 1
        c += 1
    return index


def ref_sobol_sample(a: int, dimension: int, scramble: int) -> float:
    v = scramble & 0xFFFFFFFF
    i = dimension * 52
    while a != 0:
        if a & 1:
            v ^= int(SM32[i // 52][i % 52])
        a >>= 1
        i += 1
    one_minus_eps = float(np.nextafter(np.float32(1.0), np.float32(0.0)))
    return min(one_minus_eps, np.float32(v) * np.float32(2.0 ** -32))


def test_sobol_index_matches_reference():
    dom = dsobol.SobolDomain.create((-2, -2), (258, 258), 4)
    assert dom.resolution == 512 and dom.m == 9
    rng = np.random.default_rng(0)
    px = rng.integers(-2, 258, 64)
    py = rng.integers(-2, 258, 64)
    scr, b_base = dsobol.pixel_statics(dom, px, py)
    inv_lo, inv_hi = dsobol.vdc_inv_rows(dom)
    for frame in [0, 1, 2, 3]:
        lo_s, hi_s, delta = dsobol.frame_statics(dom, frame)
        lo, hi = dsobol.sobol_index(jnp.asarray(b_base), jnp.uint32(delta),
                                    jnp.uint32(lo_s), jnp.uint32(hi_s),
                                    inv_lo, inv_hi)
        got = np.asarray(lo).astype(np.uint64) | (
            np.asarray(hi).astype(np.uint64) << np.uint64(32))
        want = np.array([
            ref_sobol_interval_to_index(dom.m, frame, int(x + 2), int(y + 2))
            for x, y in zip(px, py)
        ], dtype=np.uint64)
        np.testing.assert_array_equal(got, want)


def test_sobol_sample_matches_reference():
    dom = dsobol.SobolDomain.create((0, 0), (64, 64), 16)
    rng = np.random.default_rng(1)
    n = 128
    idx = rng.integers(0, 1 << 40, n, dtype=np.uint64)
    dims = rng.integers(0, 64, n).astype(np.int32)
    scr = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    lo = (idx & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (idx >> np.uint64(32)).astype(np.uint32)
    got = np.asarray(dsobol.sobol_sample(
        jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(dims),
        jnp.asarray(scr), dsobol.sm32_device()))
    want = np.array([
        ref_sobol_sample(int(idx[i]), int(dims[i]), int(scr[i]))
        for i in range(n)
    ], dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_sobol_dim01_stratification():
    """Dims 0/1 at each pixel's own index land in that pixel's unit square."""
    dom = dsobol.SobolDomain.create((0, 0), (16, 16), 4)
    xs, ys = np.meshgrid(np.arange(16), np.arange(16), indexing="xy")
    px, py = xs.ravel(), ys.ravel()
    scr, b_base = dsobol.pixel_statics(dom, px, py)
    inv_lo, inv_hi = dsobol.vdc_inv_rows(dom)
    for frame in range(4):
        lo_s, hi_s, delta = dsobol.frame_statics(dom, frame)
        lo, hi = dsobol.sobol_index(jnp.asarray(b_base), jnp.uint32(delta),
                                    jnp.uint32(lo_s), jnp.uint32(hi_s),
                                    inv_lo, inv_hi)
        # dims 0/1 unscrambled (reference never scrambles dims 0,1? it does —
        # scramble applies to every dim; but the remap property holds only for
        # the unscrambled sequence, so test with scramble=0)
        zeros = jnp.zeros_like(lo)
        s0 = dsobol.sobol_sample(lo, hi, jnp.zeros_like(lo, jnp.int32), zeros,
                                 dsobol.sm32_device())
        s1 = dsobol.sobol_sample(lo, hi, jnp.ones_like(lo, jnp.int32), zeros,
                                 dsobol.sm32_device())
        r0 = np.asarray(dsobol.remap_pixel_dims(dom, s0, 0, jnp.asarray(px)))
        r1 = np.asarray(dsobol.remap_pixel_dims(dom, s1, 1, jnp.asarray(py)))
        assert (r0 >= 0).all() and (r0 < 1.0).all()
        assert (r1 >= 0).all() and (r1 < 1.0).all()
        # the raw values must actually fall inside each pixel's cell
        cell0 = np.floor(np.asarray(s0) * dom.resolution).astype(int)
        cell1 = np.floor(np.asarray(s1) * dom.resolution).astype(int)
        np.testing.assert_array_equal(cell0, px)
        np.testing.assert_array_equal(cell1, py)
