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


def _xor_reduce_52(vals):
    """XOR-reduce (..., 52) uint32 along the last axis via a log tree."""
    pad = jnp.zeros(vals.shape[:-1] + (12,), vals.dtype)
    v = jnp.concatenate([vals, pad], axis=-1)  # (..., 64)
    for _ in range(6):
        half = v.shape[-1] // 2
        v = jnp.bitwise_xor(v[..., :half], v[..., half:])
    return v[..., 0]


def _index_bits(idx_lo, idx_hi):
    """(N,) u32 pairs → (N, 52) {0,1} uint32 bit masks."""
    sh_lo = jnp.arange(32, dtype=jnp.uint32)
    sh_hi = jnp.arange(20, dtype=jnp.uint32)
    bits_lo = (idx_lo[..., None] >> sh_lo) & jnp.uint32(1)
    bits_hi = (idx_hi[..., None] >> sh_hi) & jnp.uint32(1)
    return jnp.concatenate([bits_lo, bits_hi], axis=-1)


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
    """
    b = b_base ^ delta
    sh = jnp.arange(32, dtype=jnp.uint32)
    bits = (b[..., None] >> sh) & jnp.uint32(1)  # (N,32); b < 2^32
    pad = jnp.zeros(bits.shape[:-1] + (20,), jnp.uint32)
    bits52 = jnp.concatenate([bits, pad], axis=-1)
    lo = _xor_reduce_52(jnp.where(bits52 == 1, inv_lo, jnp.uint32(0)))
    hi = _xor_reduce_52(jnp.where(bits52 == 1, inv_hi, jnp.uint32(0)))
    return lo ^ shifted_lo, hi ^ shifted_hi


def sobol_sample(idx_lo, idx_hi, dim, scramble, sm32):
    """Device: Sobol value in [0,1) for per-ray dimensions.

    idx_lo/hi, dim, scramble: (N,); sm32: (1024, 52) u32 device table.
    Ref lowdiscrepancy.rs:42-57.
    """
    dim = jnp.clip(dim, 0, NUM_SOBOL_DIMENSIONS - 1)
    rows = sm32[dim]  # (N, 52) gather
    bits = _index_bits(idx_lo, idx_hi)
    v = _xor_reduce_52(jnp.where(bits == 1, rows, jnp.uint32(0)))
    v = v ^ scramble
    return jnp.minimum(ONE_MINUS_EPSILON, v.astype(jnp.float32) * INV_2_POW_32)


def index_bits52(idx_lo, idx_hi):
    """Precompute the (52, N) {0,1} bit expansion of a wave's sample index.

    Bit-major layout keeps the wide ray axis in the TPU lane dimension (a
    trailing 52 axis would pad every lane tile to 128). The index is
    constant per wave; expanding once lets every subsequent dimension
    evaluation be a dense select + XOR tree with no gathers.
    """
    sh_lo = jnp.arange(32, dtype=jnp.uint32)[:, None]
    sh_hi = jnp.arange(20, dtype=jnp.uint32)[:, None]
    bits_lo = (idx_lo[None, :] >> sh_lo) & jnp.uint32(1)
    bits_hi = (idx_hi[None, :] >> sh_hi) & jnp.uint32(1)
    return jnp.concatenate([bits_lo, bits_hi], axis=0)


def _xor_tree_axis0(vals):
    """XOR-reduce (52, N) uint32 along axis 0 via a log tree."""
    pad = jnp.zeros((12,) + vals.shape[1:], vals.dtype)
    v = jnp.concatenate([vals, pad], axis=0)  # (64, N)
    for _ in range(6):
        half = v.shape[0] // 2
        v = jnp.bitwise_xor(v[:half], v[half:])
    return v[0]


def sobol_sample_dim(bits52, dim, scramble, sm32):
    """Sobol value for ONE dimension shared by the whole wave.

    bits52: (52, N) from index_bits52; dim: scalar (may be traced); sm32:
    (1024, 52). Unlike ``sobol_sample`` (per-ray dims, row gather), this is
    a dense slice + select — the wavefront integrator allocates static
    per-bounce dimension slots so dims never diverge across rays
    (deviation from the reference's adaptive per-path dimension counters,
    sampler/sobol.rs:129-151; the sequence is still a valid Sobol LDS).
    """
    row = jax.lax.dynamic_slice(sm32, (dim, 0), (1, SOBOL_MATRIX_SIZE))[0]
    v = _xor_tree_axis0(jnp.where(bits52 == 1, row[:, None], jnp.uint32(0)))
    v = v ^ scramble
    return jnp.minimum(ONE_MINUS_EPSILON, v.astype(jnp.float32) * INV_2_POW_32)


def sobol_sample_dim2(bits52, dim, scramble, sm32):
    """Two consecutive dimensions at once → (N, 2)."""
    rows = jax.lax.dynamic_slice(sm32, (dim, 0), (2, SOBOL_MATRIX_SIZE))
    v0 = _xor_tree_axis0(jnp.where(bits52 == 1, rows[0][:, None],
                                   jnp.uint32(0)))
    v1 = _xor_tree_axis0(jnp.where(bits52 == 1, rows[1][:, None],
                                   jnp.uint32(0)))
    v = jnp.stack([v0 ^ scramble, v1 ^ scramble], axis=-1)
    return jnp.minimum(ONE_MINUS_EPSILON,
                       v.astype(jnp.float32) * INV_2_POW_32)


def remap_pixel_dims(domain: SobolDomain, s, dim01, pixel):
    """Remap dims 0/1 into the pixel's unit square (ref sobol.rs:185-192).

    s: raw sobol values (N,); dim01: 0 or 1 (axis); pixel: (N,) absolute
    pixel coordinate along that axis.
    """
    s = s * np.float32(domain.resolution) + np.float32(domain.p_min[dim01])
    return jnp.clip(s - pixel.astype(jnp.float32), 0.0, ONE_MINUS_EPSILON)


def sm32_device():
    return jnp.asarray(_load_tables()["sm32"])
