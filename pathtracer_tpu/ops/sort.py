"""Wave-compaction cost sort: argsort replacements tuned for TPU.

The per-bounce wavefront sort (integrator._wave_bounce) orders lanes by
the previous bounce's traversal step count so each chunked sub-wave's
while_loop trips to a similar bound (dead lanes sort last). The key is a
small non-negative int (traversal iterations, a few hundred), so a full
comparison sort is overkill: an LSB radix argsort runs in
O(bits x (cumsum + scatter)) — data-independent, static-shape, and
branch-free, exactly what XLA wants — versus the O(n log^2 n) bitonic
network `jnp.argsort` lowers to on TPU.

`cost_argsort` dispatches on MODE so the hardware A/B (tools/tpu_session
"shade" stage) can time both on real step-key distributions; flip the
default once measured.
"""

from __future__ import annotations

import jax.numpy as jnp

# "argsort" (XLA bitonic) or "radix"; tools/tpu_session.py times both on
# the real 65k step-key distribution — flip after measurement.
MODE = "argsort"

# Live step keys clamp to RADIX_BITS-1 bits; the dead-lane sentinel
# (anything >= the clamp) keeps sorting last. Traversal steps are a few
# hundred, so 10 bits loses nothing in practice.
RADIX_BITS = 10


def radix_argsort(key: jnp.ndarray, bits: int = RADIX_BITS) -> jnp.ndarray:
    """Stable LSB-radix argsort of small non-negative int keys.

    Keys clamp to [0, 2^bits - 1]; ties (and clamped tails) keep input
    order. Returns the permutation `perm` with key[perm] ascending.
    """
    n = key.shape[0]
    hi = jnp.int32((1 << bits) - 1)
    k = jnp.minimum(key.astype(jnp.int32), hi)
    perm = jnp.arange(n, dtype=jnp.int32)
    for b in range(bits):
        zeros = (k >> b) & 1 == 0
        z = zeros.astype(jnp.int32)
        c0 = jnp.cumsum(z) - z               # exclusive rank among zeros
        n0 = c0[-1] + z[-1]                  # total zeros
        ones_rank = jnp.arange(n, dtype=jnp.int32) - c0
        pos = jnp.where(zeros, c0, n0 + ones_rank)
        perm = jnp.zeros_like(perm).at[pos].set(perm)
        k = jnp.zeros_like(k).at[pos].set(k)
    return perm


def bucket_argsort(key: jnp.ndarray, nb: int = 16,
                   shift: int = 4) -> jnp.ndarray:
    """Stable counting argsort into nb = 2^k COARSE cost buckets.

    The wave sort only has to group lanes of similar traversal cost so
    each chunked sub-wave's while_loop trips to a similar bound — exact
    ordering buys nothing. bucket = min(key >> shift, nb-1) keeps dead-
    lane sentinels (huge keys) in the last bucket. One (nb, N) cumsum +
    one scatter, ~5x less work than the 10-pass radix and no bitonic
    network; everything but the final scatter is elementwise/reduce.
    """
    n = key.shape[0]
    i32 = jnp.int32
    bk = jnp.minimum(jnp.maximum(key.astype(i32), 0) >> shift, nb - 1)
    onehot = (bk[None, :] == jnp.arange(nb, dtype=i32)[:, None])  # (nb, N)
    oh = onehot.astype(i32)
    within = jnp.cumsum(oh, axis=1) - oh      # exclusive rank in bucket
    counts = within[:, -1] + oh[:, -1]        # (nb,) bucket sizes
    offs = jnp.cumsum(counts) - counts        # exclusive bucket offsets
    pos = jnp.sum(oh * (offs[:, None] + within), axis=0)
    return jnp.zeros((n,), i32).at[pos].set(jnp.arange(n, dtype=i32))


_MODES = ("argsort", "radix", "bucket")


def cost_argsort(key: jnp.ndarray) -> jnp.ndarray:
    """Permutation ordering wave lanes by cost key.

    Mode precedence: PTPU_WAVE_SORT_MODE env / tuned.json
    ``wave_sort_mode`` (index into _MODES) > the module MODE default."""
    from .. import tuning
    mode = _MODES[tuning.get("wave_sort_mode",
                             _MODES.index(MODE)) % len(_MODES)]
    if mode == "radix":
        return radix_argsort(key)
    if mode == "bucket":
        return bucket_argsort(key)
    return jnp.argsort(key).astype(jnp.int32)
