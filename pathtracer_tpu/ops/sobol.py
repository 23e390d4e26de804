"""Sobol' low-discrepancy sampling as vectorized u32 bit-matrix XOR ops.

Parity with reference ``src/pathtracer/lowdiscrepancy.rs`` (sobol_sample
:42-57, sobol_interval_to_index :9-39) and ``src/pathtracer/sampler/sobol.rs``
(per-pixel cantor scramble :81-87, dims 0/1 pixel-offset remap :177-193).

The scalar bit loops become wavefront-wide ops: for a batch of N rays the
52-step "XOR matrix rows selected by index bits" loop is a (N, 52) masked
gather + XOR tree reduction. 64-bit sample indices are carried as (lo, hi)
uint32 pairs since TPUs have no native int64.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import ONE_MINUS_EPSILON, HALF_MAX_I32, log2_int, round_up_pow2

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")

NUM_SOBOL_DIMENSIONS = 1024
SOBOL_MATRIX_SIZE = 52
ARRAY_START_DIM = 5  # ref sampler/sobol.rs:11

_tables_cache: dict[str, np.ndarray] = {}


def _load_tables():
    if not _tables_cache:
        _tables_cache["sm32"] = np.load(os.path.join(_ASSET_DIR, "sobol_32.npy"))
        _tables_cache["vdc"] = np.load(os.path.join(_ASSET_DIR, "sobol_vdc.npy"))
        _tables_cache["vdc_inv"] = np.load(os.path.join(_ASSET_DIR, "sobol_vdc_inv.npy"))
    return _tables_cache


INV_2_POW_32 = np.float32(2.0 ** -32)


def _bit_mask(word, b: int):
    """All-ones u32 mask where bit b of word is set (0-b trick: -1 or 0)."""
    return jnp.uint32(0) - ((word >> jnp.uint32(b)) & jnp.uint32(1))


@dataclasses.dataclass(frozen=True)
class SobolDomain:
    """Static per-render Sobol configuration.

    Covers the sample rectangle [p_min, p_max): resolution = round-up-pow2 of
    the larger extent, m = log2(resolution) (ref sampler/sobol.rs:34-60).
    """

    p_min: tuple[int, int]
    resolution: int
    m: int
    spp: int

    @staticmethod
    def create(p_min, p_max, samples_per_pixel: int) -> "SobolDomain":
        diag = (p_max[0] - p_min[0], p_max[1] - p_min[1])
        resolution = round_up_pow2(max(diag))
        m = log2_int(resolution) if resolution > 0 else 0
        assert m <= 16, "sobol domain resolution above 2^16 unsupported"
        spp = round_up_pow2(samples_per_pixel)
        return SobolDomain((int(p_min[0]), int(p_min[1])), resolution, m, spp)


def pixel_statics(domain: SobolDomain, px: np.ndarray, py: np.ndarray):
    """Host precompute of per-pixel constants.

    px, py: absolute pixel coords (may be negative, inside sample bounds).
    Returns (scramble (N,) u32, b_base (N,) u32) where b_base = (x<<m)|y of
    the bounds-relative pixel (ref lowdiscrepancy.rs:27).
    """
    x = np.asarray(px, np.int64) - domain.p_min[0]
    y = np.asarray(py, np.int64) - domain.p_min[1]
    sx = (np.asarray(px, np.int64) + int(HALF_MAX_I32)).astype(np.uint64)
    sy = (np.asarray(py, np.int64) + int(HALF_MAX_I32)).astype(np.uint64)
    with np.errstate(over="ignore"):
        s = sx + sy
        scramble = (s * (s + np.uint64(1)) // np.uint64(2) + sy)
    scramble_u32 = (scramble & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    b_base = ((x.astype(np.uint64) << np.uint64(domain.m)) | y.astype(np.uint64))
    assert domain.m <= 16
    return scramble_u32, b_base.astype(np.uint32)


def frame_statics(domain: SobolDomain, frame: int):
    """Host precompute for one sample index (ref lowdiscrepancy.rs:9-26).

    Returns (shifted_lo, shifted_hi, delta) u32 host scalars:
    shifted = frame << 2m; delta = XOR of vdc rows over frame bits.
    """
    m = domain.m
    if m == 0:
        return np.uint32(0), np.uint32(0), np.uint32(0)
    vdc = _load_tables()["vdc"]
    shifted = np.uint64(frame) << np.uint64(2 * m)
    delta = np.uint64(0)
    f, c = int(frame), 0
    while f != 0:
        if f & 1:
            delta ^= vdc[m - 1][c]
        f >>= 1
        c += 1
    assert delta < (1 << 32)
    return (
        np.uint32(shifted & np.uint64(0xFFFFFFFF)),
        np.uint32(shifted >> np.uint64(32)),
        np.uint32(delta),
    )


def vdc_inv_rows(domain: SobolDomain):
    """(52,) u32 lo/hi device arrays of the inverse-vdc row for this m."""
    vdc_inv = _load_tables()["vdc_inv"]
    row = vdc_inv[domain.m - 1] if domain.m > 0 else np.zeros(52, np.uint64)
    return (
        jnp.asarray((row & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((row >> np.uint64(32)).astype(np.uint32)),
    )


def sobol_index(b_base, delta, shifted_lo, shifted_hi, inv_lo, inv_hi):
    """Device: per-pixel 64-bit Sobol sample index as (lo, hi) u32.

    b_base (N,) u32; rest scalars/(52,) rows. Ref lowdiscrepancy.rs:27-38.
    Evaluated as a 32-step masked-XOR chain over (N,) words — fully fusible
    elementwise ops, no (N, bits) intermediates (the bit-matrix form
    round-tripped ~50 MB of HBM per evaluation).
    """
    b = b_base ^ delta
    lo = jnp.zeros_like(b)
    hi = jnp.zeros_like(b)
    for c in range(32):  # b < 2^32
        m = _bit_mask(b, c)
        lo = lo ^ (inv_lo[c] & m)
        hi = hi ^ (inv_hi[c] & m)
    return lo ^ shifted_lo, hi ^ shifted_hi


def _dim_value(idx_lo, idx_hi, row):
    """XOR of row entries selected by the 52 index bits (masked chain).

    row: (52,) or (N, 52) u32; idx_lo/hi: (N,) u32. All ops are (N,)
    elementwise, so XLA fuses the whole 52-step chain into one pass.
    """
    per_ray = row.ndim == 2
    v = jnp.zeros_like(idx_lo)
    for b in range(32):
        r = row[..., b] if per_ray else row[b]
        v = v ^ (r & _bit_mask(idx_lo, b))
    for b in range(20):
        r = row[..., 32 + b] if per_ray else row[32 + b]
        v = v ^ (r & _bit_mask(idx_hi, b))
    return v


def _to_unit(v):
    return jnp.minimum(ONE_MINUS_EPSILON, v.astype(jnp.float32) * INV_2_POW_32)


def sobol_sample(idx_lo, idx_hi, dim, scramble, sm32):
    """Device: Sobol value in [0,1) for per-ray dimensions.

    idx_lo/hi, dim, scramble: (N,); sm32: (1024, 52) u32 device table.
    Ref lowdiscrepancy.rs:42-57.
    """
    dim = jnp.clip(dim, 0, NUM_SOBOL_DIMENSIONS - 1)
    rows = sm32[dim]  # (N, 52) gather — per-ray dims (debug/test path)
    return _to_unit(_dim_value(idx_lo, idx_hi, rows) ^ scramble)


def sobol_sample_dim(idx_lo, idx_hi, dim, scramble, sm32):
    """Sobol value for ONE dimension shared by the whole wave.

    idx_lo/hi: (N,) u32 from sobol_index; dim: scalar (may be traced);
    sm32: (1024, 52). The wavefront integrator allocates static per-bounce
    dimension slots so dims never diverge across rays (deviation from the
    reference's adaptive per-path dimension counters, sampler/sobol.rs:
    129-151; the sequence is still a valid Sobol LDS). The row fetch is one
    (1, 52) slice; the XOR chain fuses with surrounding elementwise work.
    """
    row = jax.lax.dynamic_slice(sm32, (dim, 0), (1, SOBOL_MATRIX_SIZE))[0]
    return _to_unit(_dim_value(idx_lo, idx_hi, row) ^ scramble)


def sobol_sample_dim2(idx_lo, idx_hi, dim, scramble, sm32):
    """Two consecutive dimensions at once → (N, 2)."""
    rows = jax.lax.dynamic_slice(sm32, (dim, 0), (2, SOBOL_MATRIX_SIZE))
    v0 = _dim_value(idx_lo, idx_hi, rows[0]) ^ scramble
    v1 = _dim_value(idx_lo, idx_hi, rows[1]) ^ scramble
    return jnp.stack([_to_unit(v0), _to_unit(v1)], axis=-1)


def remap_pixel_dims(domain: SobolDomain, s, dim01, pixel):
    """Remap dims 0/1 into the pixel's unit square (ref sobol.rs:185-192).

    s: raw sobol values (N,); dim01: 0 or 1 (axis); pixel: (N,) absolute
    pixel coordinate along that axis.
    """
    s = s * np.float32(domain.resolution) + np.float32(domain.p_min[dim01])
    return jnp.clip(s - pixel.astype(jnp.float32), 0.0, ONE_MINUS_EPSILON)


def sm32_device():
    return jnp.asarray(_load_tables()["sm32"])
