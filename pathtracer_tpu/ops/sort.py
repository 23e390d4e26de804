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


def cost_argsort(key: jnp.ndarray) -> jnp.ndarray:
    """Permutation ordering wave lanes by cost key (see MODE)."""
    if MODE == "radix":
        return radix_argsort(key)
    return jnp.argsort(key).astype(jnp.int32)
