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


def random_sample_dim(pixel_hash, frame, dim):
    """Plain uniform sample (the reference PixelSampler's RNG fallback,
    sampler/mod.rs:131-149)."""
    key = hash_combine(pixel_hash, U32(dim) * U32(0x68BC21EB))
    return uniform_from_hash(
        hash_combine(key, jnp.asarray(frame, U32) + U32(0x02E5BE93)))
