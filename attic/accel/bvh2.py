"""Unified-row BVH: ONE 20-float gather per traversal step.

The classic flattened-node traversal (accel/bvh.py, mirroring reference
``accelerator.rs:309-475``) gathers per popped node: an 8-wide node row
PLUS up to four 12-wide triangle rows — ~60 elements per step, and TPU
per-lane gathers are the traversal's entire cost (measured bandwidth-
bound, ~0.43 ns/element/lane). This layout re-packs the tree so every
step reads exactly one 20-float row:

  INTERIOR row ("pair"): both children's slabs + refs + split axis
      [c0.bmin(3) c0.bmax(3) c1.bmin(3) c1.bmax(3) ref0 ref1 axis pad(5)]
  LEAF row (max_leaf=2): triangle vertices INLINE + global tri ids
      [t0.p0(3) t0.p1(3) t0.p2(3) t1.p0(3) t1.p1(3) t1.p2(3) id0 id1]

``ref`` encoding (exact in f32 below 2^24): +(row+1) = interior row,
-(row+1) = leaf row, 0 = none. Traversal tests BOTH children at the
parent (only hit children are ever visited), descends into the near
child directly and pushes the far child — one stack op per both-hit
visit instead of the push-both/pop-both dance. Leaf steps run two watertight
tests on data already in registers (zero extra gathers).

This is the TPU-native answer to the same problem CUDA tracers solve
with SIMT divergence: no per-lane control flow exists, so the win is
minimizing gathered bytes x iterations, not branch coherence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.intersect import watertight_hit_diag, _take3
from .bvh import STACK_DEPTH, _slab_test

U_WIDTH = 20
LEAF_SIZE = 2


def build_unified(bmin, bmax, off, npr, ax, p0, p1, p2) -> tuple:
    """Convert flattened SAH nodes (host numpy, max_leaf<=2) + REORDERED
    triangle arrays into the unified row table.

    Returns (rows (R, 20) f32, root_ref int). Triangle ids written into
    leaf rows are positions in the reordered arrays (= global tri ids
    after TracedScene's reorder).

    Fully vectorized: the flattened SAH layout is depth-first pre-order
    and every node emits exactly one unified row, so row_index(node) ==
    node and the whole table is numpy fancy indexing (the earlier
    per-node recursion took ~200 s on a 123.6k-tri scene; this is ms).
    """
    bmin = np.asarray(bmin, np.float32)
    bmax = np.asarray(bmax, np.float32)
    off = np.asarray(off, np.int64)
    npr = np.asarray(npr, np.int64)
    ax = np.asarray(ax, np.int64)
    p0 = np.asarray(p0, np.float32)
    p1 = np.asarray(p1, np.float32)
    p2 = np.asarray(p2, np.float32)
    m = len(bmin)
    assert m < (1 << 24), "row refs must stay exact in f32"
    assert npr.max(initial=0) <= LEAF_SIZE, \
        "unified layout requires max_leaf <= 2"
    is_leaf = npr > 0
    node_ids = np.arange(m, dtype=np.int64)
    ref = np.where(is_leaf, -(node_ids + 1), node_ids + 1).astype(np.float32)
    rows = np.zeros((m, U_WIDTH), np.float32)

    ii = np.nonzero(~is_leaf)[0]
    c0 = ii + 1            # first child = next node in pre-order
    c1 = off[ii]           # second child offset
    rows[ii, 0:3] = bmin[c0]
    rows[ii, 3:6] = bmax[c0]
    rows[ii, 6:9] = bmin[c1]
    rows[ii, 9:12] = bmax[c1]
    rows[ii, 12] = ref[c0]
    rows[ii, 13] = ref[c1]
    rows[ii, 14] = ax[ii].astype(np.float32)

    li = np.nonzero(is_leaf)[0]
    lo = off[li]
    lk = npr[li]
    assert (lo + lk).max(initial=0) < (1 << 24), \
        "leaf triangle ids must stay exact in f32"
    for j in range(LEAF_SIZE):
        has_j = j < lk
        tid = np.where(has_j, lo + j, 0)
        sel = has_j[:, None]
        rows[li, 9 * j:9 * j + 3] = np.where(sel, p0[tid], 0.0)
        rows[li, 9 * j + 3:9 * j + 6] = np.where(sel, p1[tid], 0.0)
        rows[li, 9 * j + 6:9 * j + 9] = np.where(sel, p2[tid], 0.0)
        rows[li, 18 + j] = np.where(has_j, tid, -1.0).astype(np.float32)

    return rows, int(ref[0])


def bvh2_intersect(u_rows, u_root: int, o, d, t_max, any_hit: bool = False,
                   count_steps: bool = False):
    """Unified-row traversal: one (N, 20) gather per step.

    u_rows: (R, 20) device table; u_root: static signed root ref.
    Returns the intersect_brute-style hit dict, or (N,) bool occlusion.
    count_steps=True adds a per-lane live-iteration counter to the hit
    dict ("steps") — profiling only.
    """
    n = o.shape[0]
    f32 = jnp.float32
    inv_d = 1.0 / d
    neg = d < 0.0
    rows_i = jnp.arange(n)

    state = dict(
        stack=jnp.zeros((n, STACK_DEPTH), jnp.int32),
        sp=jnp.zeros((n,), jnp.int32),
        cur=jnp.full((n,), u_root, jnp.int32),
        t_best=t_max,
        tri=jnp.zeros((n,), jnp.int32),
        b=jnp.zeros((n, 3), f32),
        found=jnp.zeros((n,), bool),
    )
    if count_steps:
        state["steps"] = jnp.zeros((n,), jnp.int32)

    def live_mask(st):
        live = (st["cur"] != 0) | (st["sp"] > 0)
        if any_hit:
            live = live & ~st["found"]
        return live

    def body(st):
        live = live_mask(st)
        # pop when no current node
        do_pop = (st["cur"] == 0) & (st["sp"] > 0) & live
        sp = jnp.where(do_pop, st["sp"] - 1, st["sp"])
        cur = jnp.where(do_pop,
                        st["stack"][rows_i, jnp.minimum(sp, STACK_DEPTH - 1)],
                        st["cur"])
        cur = jnp.where(live, cur, 0)

        row = u_rows[jnp.abs(cur) - 1]  # THE one gather per step
        is_leaf = cur < 0
        act = live & (cur != 0)

        # --- leaf step: two watertight tests on in-register vertices
        t_best, tri, b, found = st["t_best"], st["tri"], st["b"], st["found"]
        lact = act & is_leaf
        for j in range(LEAF_SIZE):
            t_j, b_j, h_j = watertight_hit_diag(
                o, d, t_best, row[:, 9 * j:9 * j + 3],
                row[:, 9 * j + 3:9 * j + 6], row[:, 9 * j + 6:9 * j + 9])
            id_j = row[:, 18 + j].astype(jnp.int32)
            take = lact & h_j & (id_j >= 0)
            t_best = jnp.where(take, t_j, t_best)
            tri = jnp.where(take, id_j, tri)
            b = jnp.where(take[:, None], b_j, b)
            found = found | take

        # --- interior step: slab-test both children, descend near,
        # push far only when both hit
        iact = act & ~is_leaf
        hit0 = _slab_test(row[:, 0:3], row[:, 3:6], o, inv_d, t_best) & iact
        hit1 = _slab_test(row[:, 6:9], row[:, 9:12], o, inv_d, t_best) & iact
        ref0 = row[:, 12].astype(jnp.int32)
        ref1 = row[:, 13].astype(jnp.int32)
        axis = row[:, 14].astype(jnp.int32)
        dneg = _take3(neg, axis)
        near_ref = jnp.where(dneg, ref1, ref0)
        far_ref = jnp.where(dneg, ref0, ref1)
        near_hit = jnp.where(dneg, hit1, hit0)
        far_hit = jnp.where(dneg, hit0, hit1)

        first = jnp.where(near_hit, near_ref,
                          jnp.where(far_hit, far_ref, 0))
        push = near_hit & far_hit
        slot = jnp.minimum(sp, STACK_DEPTH - 1)
        stack = st["stack"].at[rows_i, slot].set(
            jnp.where(push, far_ref, st["stack"][rows_i, slot]))
        sp = jnp.where(push, sp + 1, sp)

        cur = jnp.where(iact, first, jnp.where(lact, 0, cur))
        out = dict(stack=stack, sp=sp, cur=cur, t_best=t_best, tri=tri,
                   b=b, found=found)
        if count_steps:
            out["steps"] = st["steps"] + live.astype(jnp.int32)
        return out

    final = jax.lax.while_loop(lambda st: jnp.any(live_mask(st)), body,
                               state)
    if any_hit:
        return (final["found"], final["steps"]) if count_steps \
            else final["found"]
    valid = final["found"]
    out = dict(valid=valid, t=jnp.where(valid, final["t_best"], 0.0),
               tri=final["tri"], b=final["b"])
    if count_steps:
        out["steps"] = final["steps"]
    return out


def bvh2_intersect_chunked(u_rows, u_root: int, o, d, t_max,
                           chunks: int = 4, any_hit: bool = False):
    """Split the wave into independent sub-loops (the TPU runtime overlaps
    independent while_loops; see bvh.bvh_intersect_chunked)."""
    n = o.shape[0]
    if chunks <= 1 or n < 4096 * chunks or n % chunks != 0:
        return bvh2_intersect(u_rows, u_root, o, d, t_max, any_hit=any_hit)
    c = n // chunks
    outs = [bvh2_intersect(u_rows, u_root, o[i * c:(i + 1) * c],
                           d[i * c:(i + 1) * c], t_max[i * c:(i + 1) * c],
                           any_hit=any_hit)
            for i in range(chunks)]
    if any_hit:
        return jnp.concatenate(outs)
    return {k: jnp.concatenate([h[k] for h in outs]) for k in outs[0]}
