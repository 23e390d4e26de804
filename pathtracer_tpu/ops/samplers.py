"""Sampler family: Sobol' (default), stratified, uniform-random.

Parity targets: the reference ships StratifiedSampler (jittered strata +
per-dimension decorrelation shuffles, sampler/stratified.rs:91-202) and
SobolSampler (the default, sampler/mod.rs:169-170). The reference's
stratified sampler uses a stateful SmallRng; the TPU rebuild derives all
randomness statelessly from (pixel, dimension, sample-index) hashes so the
whole wave evaluates in parallel and any sample is reproducible in
isolation — same estimator statistics (one jittered stratum per sample,
decorrelated across dimensions via per-dimension permutations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import ONE_MINUS_EPSILON

U32 = jnp.uint32


def hash_u32(x):
    """PCG-style integer hash (u32 → u32), elementwise."""
    x = jnp.asarray(x, U32)
    x = x * U32(747796405) + U32(2891336453)
    word = ((x >> ((x >> U32(28)) + U32(4))) ^ x) * U32(277803737)
    return (word >> U32(22)) ^ word


def hash_combine(a, b):
    return hash_u32(jnp.asarray(a, U32) ^ (jnp.asarray(b, U32)
                                           * U32(0x9E3779B9)))


def uniform_from_hash(h):
    """u32 hash → float in [0, 1)."""
    return jnp.minimum(h.astype(jnp.float32) * np.float32(2.0 ** -32),
                       ONE_MINUS_EPSILON)


def _permute_pow2(index, log2_n: int, key):
    """Keyed bijection on [0, 2^log2_n): rounds of xor-const, odd-multiply
    and xorshift — each step is invertible on the k-bit domain.

    Replaces the reference's Fisher-Yates shuffle (sampling.rs:50-58) with
    a stateless bijection: same decorrelation role, wave-parallel.
    """
    if log2_n == 0:
        return jnp.zeros_like(jnp.asarray(index, U32))
    mask = U32((1 << log2_n) - 1)
    shift = max(1, log2_n // 2)
    x = jnp.asarray(index, U32) & mask
    for r in range(3):
        h = hash_u32(key + U32((r * 0x85EBCA6B) & 0xFFFFFFFF))
        x = x ^ (h & mask)
        # key-derived odd multiplier: odd => bijective mod 2^k
        x = (x * ((h >> U32(8)) | U32(1))) & mask
        x = x ^ (x >> U32(shift))
    return x & mask


def stratified_sample_dim(pixel_hash, frame, spp_log2: int, dim):
    """One stratified-jittered dimension for the whole wave.

    pixel_hash: (N,) u32 per-pixel seed; frame: scalar sample index;
    spp_log2: log2(samples per pixel); dim: scalar dimension index.
    Ref stratified.rs:91-202 semantics: sample s lands in stratum
    perm(s)/spp + jitter/spp with an independent permutation per
    (pixel, dimension).
    """
    key = hash_combine(pixel_hash, U32(dim) * U32(0x68BC21EB))
    stratum = _permute_pow2(jnp.broadcast_to(jnp.asarray(frame, U32),
                                             pixel_hash.shape),
                            spp_log2, key)
    jitter = uniform_from_hash(
        hash_combine(key, jnp.asarray(frame, U32) + U32(0x02E5BE93)))
    inv = np.float32(1.0 / (1 << spp_log2))
    return jnp.minimum((stratum.astype(jnp.float32) + jitter) * inv,
                       ONE_MINUS_EPSILON)


def stratified_sample_dim2(pixel_hash, frame, spp_log2: int, dim):
    """One stratified-jittered 2D PAIR for the whole wave — the reference's
    stratified_sample_2d + shuffle (sampling.rs:20-58): the spp samples of a
    pixel tile an nx x ny grid over [0,1)^2, one sample per cell, visited in
    a per-(pixel, dim-pair) keyed permutation. nx = 2^ceil(l/2),
    ny = 2^floor(l/2) (the ref builds spp = k*k from dim_pixel_samples; the
    pow2 analogue splits the exponent). Returns (N, 2)."""
    key = hash_combine(pixel_hash, U32(dim) * U32(0x68BC21EB))
    cell = _permute_pow2(jnp.broadcast_to(jnp.asarray(frame, U32),
                                          pixel_hash.shape),
                         spp_log2, key)
    ly = spp_log2 // 2
    lx = spp_log2 - ly
    cx = cell & U32((1 << lx) - 1)
    cy = cell >> U32(lx)
    jx = uniform_from_hash(
        hash_combine(key, jnp.asarray(frame, U32) + U32(0x02E5BE93)))
    jy = uniform_from_hash(
        hash_combine(key, jnp.asarray(frame, U32) + U32(0x63D83595)))
    x = jnp.minimum((cx.astype(jnp.float32) + jx) * np.float32(0.5 ** lx),
                    ONE_MINUS_EPSILON)
    y = jnp.minimum((cy.astype(jnp.float32) + jy) * np.float32(0.5 ** ly),
                    ONE_MINUS_EPSILON)
    return jnp.stack([x, y], axis=-1)


def permute_general(index, n: int, key):
    """Keyed bijection on [0, n) for arbitrary n: cycle-walk the pow2
    bijection over the next power of two (Kensler's hash-permutation
    construction — iterate until the image lands inside the domain; the
    walk visits each out-of-range point at most once, so it terminates
    and stays bijective)."""
    if n <= 1:
        return jnp.zeros_like(jnp.asarray(index, U32))
    log2 = int(np.ceil(np.log2(n)))
    # do-while: permute at least once, then keep walking the cycle while
    # out of range. A walk starting in [0, n) rides a cycle that contains
    # in-domain points, so it terminates (expected < 2 steps since
    # n > 2^(log2-1)).
    x = _permute_pow2(jnp.asarray(index, U32), log2, key)
    x = jax.lax.while_loop(
        lambda x: jnp.any(x >= U32(n)),
        lambda x: jnp.where(x >= U32(n), _permute_pow2(x, log2, key), x), x)
    return x


def lhs_2d_dim(pixel_hash, frame, dim, i: int, n: int):
    """i-th of the n latin-hypercube 2D points of this pixel sample.

    Parity with the reference's per-sample get_2d_array(n) filled by
    latin_hyper_cube_2d (sampling.rs:60-82, requested by
    uniform_sample_all_lights, integrator.rs:152-153): across i = 0..n the
    x strata {perm_x(i)} and y strata {perm_y(i)} are each hit exactly
    once. Stateless: permutations keyed by (pixel, frame, dim, axis)."""
    base = hash_combine(pixel_hash, U32(dim) * U32(0x68BC21EB))
    key = hash_combine(base, jnp.asarray(frame, U32) + U32(0x1B873593))
    idx = jnp.broadcast_to(jnp.asarray(i, U32), pixel_hash.shape)
    sx = permute_general(idx, n, key)
    sy = permute_general(idx, n, hash_u32(key + U32(0x5BD1E995)))
    jx = uniform_from_hash(hash_combine(key, U32(2 * i)))
    jy = uniform_from_hash(hash_combine(key, U32(2 * i + 1)))
    inv = np.float32(1.0 / n)
    x = jnp.minimum((sx.astype(jnp.float32) + jx) * inv, ONE_MINUS_EPSILON)
    y = jnp.minimum((sy.astype(jnp.float32) + jy) * inv, ONE_MINUS_EPSILON)
    return jnp.stack([x, y], axis=-1)


def random_sample_dim(pixel_hash, frame, dim):
    """Plain uniform sample (the reference PixelSampler's RNG fallback,
    sampler/mod.rs:131-149)."""
    key = hash_combine(pixel_hash, U32(dim) * U32(0x68BC21EB))
    return uniform_from_hash(
        hash_combine(key, jnp.asarray(frame, U32) + U32(0x02E5BE93)))
