"""Row gathers tuned for TPU: one-hot MXU matmul for small tables.

Per-lane gathers on TPU run near one element per cycle — a (N,) gather
from a (F, K) table costs ~N*K cycles and dominated the round-1 bounce
profile (~30 separate per-triangle gathers per bounce). For small F the
idiomatic TPU gather is a one-hot matmul: build (N, F) one-hot rows and
multiply into the packed (F, K) attribute matrix on the MXU — one fused
op, exact (each one-hot row copies a single table row; the bf16x3
decomposition used by HIGHEST precision is an exact f32 splitting, and
1.0 * x accumulates the split back losslessly; verified bit-exact in
tests/test_gather.py).

Tables larger than ONEHOT_MAX fall back to a native gather — but from ONE
packed matrix per subsystem instead of a dozen separate arrays, so the
gather-unit pass is amortized across all columns of a row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ONEHOT_MAX = 4096


def take_rows(table, idx, max_onehot: int = ONEHOT_MAX):
    """table: (F, K) f32; idx: (...,) int → (..., K) rows.

    One-hot MXU matmul when F <= max_onehot, else a native row gather.
    """
    f = table.shape[0]
    if f > max_onehot:
        return table[idx]
    flat = idx.reshape(-1)
    onehot = (flat[:, None] == jnp.arange(f, dtype=idx.dtype)[None, :]) \
        .astype(jnp.float32)
    rows = jnp.dot(onehot, table, precision=jax.lax.Precision.HIGHEST)
    return rows.reshape(idx.shape + (table.shape[1],))
