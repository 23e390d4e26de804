"""8-wide BVH with 64-float rows and a register-resident short stack.

Measured TPU facts this layout is built on (tools/probe_gather_width.py):
row-gather cost is ~12 ns/row/lane REGARDLESS of row width (4..64 f32
flat) and dtype, and per-lane dynamic stack slots cost like gathers. So
the binary unified-row layout (accel/bvh2, 20-float rows) was optimizing
the wrong metric: the win is FEWER ROWS GATHERED, not fewer elements.

Layout (one (R, 64) f32 table, self-describing rows):

  INTERIOR row: 8 children's slabs component-major
      [bminx(8) bminy(8) bminz(8) bmaxx(8) bmaxy(8) bmaxz(8)] = 48
      [48] base child row (children occupy rows base+slot, slot 0..7)
      [63] kind = 0
  LEAF row (max 6 inline triangles):
      [9*j .. 9*j+9) tri j vertices p0 p1 p2, [54+j] global tri id (-1 pad)
      [63] kind = 1

Children are assigned SLOTS by their centroid's octant relative to the
node center (bit2=x+, bit1=y+, bit0=z+), so traversal visits children in
approximate front-to-back order as slot = k XOR ray_octant, k = 0..7 —
no distance sort, no per-node axis field (Ylitie et al. 2017 ordering,
re-derived for lockstep lanes). Empty slots carry +inf boxes, which the
robust slab test culls unconditionally.

Traversal state per lane is (cur_base, cur_mask) plus a K-deep stack of
the same pairs held as (K, N) arrays updated by conditional shifts —
ELEMENTWISE ops, not per-lane dynamic indexing, so the only gather per
iteration is the single child-row fetch. Each iteration retires one hit
child: interior -> 8 slab tests -> new (base, mask); leaf -> 6 inline
watertight tests.

Replaces the reference's per-ray recursive BVH::intersect
(accelerator.rs:358-475) as the device traversal; the host build reuses
the SAH binary builder (accel/bvh.py, accelerator.rs:206-267 semantics)
and collapses it 8-wide.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.intersect import watertight_hit_diag
from ..core import math as pm
from .bvh import build_bvh

W8 = 64
LEAF8 = 6
STACK8 = 12  # BVH8 height bound; builder asserts depth < STACK8


# --------------------------------------------------------------------------
# host build: binary SAH -> 8-wide collapse -> row table


# candidate slot order per octant preference: slots ranked by hamming
# distance of (slot XOR pref) — nearest-free fallback for slot conflicts
_ORDER_TAB = np.asarray(
    [sorted(range(8), key=lambda s, p=p: (bin(s ^ p).count("1"), s))
     for p in range(8)], np.int64)  # (8, 8)


def build_bvh8(p0, p1, p2, max_leaf: int = LEAF8):
    """Build the 8-wide row table from a triangle soup (host numpy).

    Returns (table (R, 64) f32, order (F,) permutation, depth). Triangle
    ids in leaf rows index the REORDERED arrays (apply `order` first,
    exactly like accel/bvh.build_bvh).
    """
    assert max_leaf <= LEAF8
    b = build_bvh(np.asarray(p0), np.asarray(p1), np.asarray(p2), max_leaf)
    p0r = np.asarray(p0, np.float32)[b.order]
    p1r = np.asarray(p1, np.float32)[b.order]
    p2r = np.asarray(p2, np.float32)[b.order]
    table, depth = bvh8_from_binary(b, p0r, p1r, p2r)
    return table, b.order, depth


def bvh8_from_binary(b, p0r, p1r, p2r):
    """Collapse a built binary BVH (accel/bvh.BVHArrays) into the 8-wide
    row table. p0r/p1r/p2r are the triangle vertices ALREADY permuted
    into ``b.order``. Returns (table (R, 64) f32, depth). The binary
    leaves may be any size ≤ LEAF8 — subtrees holding ≤ LEAF8 triangles
    are merged into one full leaf row (pre-order flattening keeps each
    subtree's primitives contiguous)."""
    bmin = np.asarray(b.bounds_min, np.float32)
    bmax = np.asarray(b.bounds_max, np.float32)
    off = np.asarray(b.offset, np.int64)
    npr = np.asarray(b.n_prims, np.int64)
    p0r = np.asarray(p0r, np.float32)
    p1r = np.asarray(p1r, np.float32)
    p2r = np.asarray(p2r, np.float32)
    assert npr.max(initial=0) <= LEAF8, "binary leaves must fit a leaf row"
    ext = np.maximum(bmax - bmin, 0.0)
    sa = (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
          + ext[:, 2] * ext[:, 0])
    # subtree triangle (start, count): pre-order flatten keeps each
    # subtree's primitives contiguous, enabling merged full leaves.
    # Plain-python lists: numpy scalar indexing in this 2F-length loop
    # costs ~10 s at 123k tris, lists ~0.1 s.
    m = len(bmin)
    npr_l = npr.tolist()
    off_l = off.tolist()
    subtree_n = [0] * m
    subtree_s = [0] * m
    for i in range(m - 1, -1, -1):
        if npr_l[i] > 0:
            subtree_n[i] = npr_l[i]
            subtree_s[i] = off_l[i]
        else:
            subtree_n[i] = subtree_n[i + 1] + subtree_n[off_l[i]]
            subtree_s[i] = subtree_s[i + 1]
    subtree_n = np.asarray(subtree_n, np.int64)
    subtree_s = np.asarray(subtree_s, np.int64)

    def leaf_rows_vec(nodes: np.ndarray) -> np.ndarray:
        """(K,) node ids (subtree_n <= LEAF8) -> (K, 64) leaf rows."""
        k = len(nodes)
        r = np.zeros((k, W8), np.float32)
        o = subtree_s[nodes]
        cnt = subtree_n[nodes]
        for j in range(LEAF8):
            have = j < cnt
            tri = np.where(have, o + j, 0)
            r[:, 9 * j:9 * j + 3] = np.where(have[:, None], p0r[tri], 0.0)
            r[:, 9 * j + 3:9 * j + 6] = np.where(have[:, None], p1r[tri], 0.0)
            r[:, 9 * j + 6:9 * j + 9] = np.where(have[:, None], p2r[tri], 0.0)
            r[:, 54 + j] = np.where(have, tri.astype(np.float32), -1.0)
        r[:, 63] = 1.0
        return r

    # vectorized level-by-level collapse (BFS; the row a node lands in is
    # assigned by its parent, blocks of 8 allocated in frontier order)
    idx_chunks: list[np.ndarray] = []
    val_chunks: list[np.ndarray] = []
    alloc = 1  # row 0 = root
    depth = 1

    if subtree_n[0] <= LEAF8:
        # degenerate: whole scene fits one leaf -> root with a single child
        r = np.zeros(W8, np.float32)
        r[0:24] = np.inf
        r[24:48] = np.inf
        r[0], r[8], r[16] = bmin[0]
        r[24], r[32], r[40] = bmax[0]
        r[48] = np.float32(alloc)
        idx_chunks.append(np.asarray([0, alloc], np.int64))
        val_chunks.append(np.stack([r, leaf_rows_vec(np.asarray([0]))[0]]))
        alloc += 8
    else:
        frontier = np.asarray([0], np.int64)       # binary node ids
        frontier_rows = np.asarray([0], np.int64)  # their table rows
        while len(frontier):
            fn = len(frontier)
            ar = np.arange(fn)
            # --- split each node into <= 8 clusters: repeatedly split the
            # splittable cluster (interior subtree, > LEAF8 tris) with the
            # largest surface area. cl: (F, 8), -1 = empty.
            cl = np.full((fn, 8), -1, np.int64)
            cl[:, 0] = frontier
            cnt = np.ones(fn, np.int64)
            for _ in range(7):
                cls = np.clip(cl, 0, None)
                can = (cl >= 0) & (subtree_n[cls] > LEAF8)
                sa_c = np.where(can, sa[cls], -np.inf)
                j = np.argmax(sa_c, axis=1)
                do = can[ar, j] & (cnt < 8)
                node = cl[ar, j]
                sel = ar[do]
                cl[sel, j[do]] = node[do] + 1        # first child
                cl[sel, cnt[do]] = off[node[do]]     # second child
                cnt[do] += 1
            have = cl >= 0
            cls = np.clip(cl, 0, None)
            # --- slot assignment by centroid octant vs node center, with
            # nearest-free-by-XOR fallback (same policy as the recursive
            # original: clusters in array order, candidates by hamming)
            centers = 0.5 * (bmin[cls] + bmax[cls])          # (F, 8, 3)
            nc = 0.5 * (bmin[frontier] + bmax[frontier])     # (F, 3)
            prefs = ((centers[..., 0] > nc[:, None, 0]) * 4
                     + (centers[..., 1] > nc[:, None, 1]) * 2
                     + (centers[..., 2] > nc[:, None, 2])).astype(np.int64)
            taken = np.zeros((fn, 8), bool)
            slots = np.full((fn, 8), -1, np.int64)
            for i in range(8):
                assigned = np.full(fn, -1, np.int64)
                for rank in range(8):
                    cand = _ORDER_TAB[prefs[:, i], rank]
                    free = (assigned < 0) & have[:, i] & ~taken[ar, cand]
                    assigned = np.where(free, cand, assigned)
                    taken[ar[free], cand[free]] = True
                slots[:, i] = assigned
            # --- emit this level's interior rows
            bases = alloc + 8 * ar
            alloc += 8 * fn
            rows_i = np.zeros((fn, W8), np.float32)
            rows_i[:, 0:48] = np.inf  # empty slots: +inf boxes
            sel = slots[have]
            src = cl[have]
            fi = np.broadcast_to(ar[:, None], (fn, 8))[have]
            for comp, arr in enumerate((bmin[src][:, 0], bmin[src][:, 1],
                                        bmin[src][:, 2], bmax[src][:, 0],
                                        bmax[src][:, 1], bmax[src][:, 2])):
                rows_i[fi, 8 * comp + sel] = arr
            rows_i[:, 48] = bases.astype(np.float32)
            idx_chunks.append(frontier_rows)
            val_chunks.append(rows_i)
            # --- children: leaves emit now, interiors join the frontier
            child_rows = bases[fi] + sel
            is_leaf_c = subtree_n[src] <= LEAF8
            leaf_nodes = src[is_leaf_c]
            if len(leaf_nodes):
                idx_chunks.append(child_rows[is_leaf_c])
                val_chunks.append(leaf_rows_vec(leaf_nodes))
            frontier = src[~is_leaf_c]
            frontier_rows = child_rows[~is_leaf_c]
            if len(frontier):
                depth += 1

    table = np.zeros((alloc, W8), np.float32)
    table[np.concatenate(idx_chunks)] = np.concatenate(val_chunks)
    assert table.shape[0] < (1 << 24), "row refs must stay exact in f32"
    assert len(p0r) < (1 << 24), "leaf tri ids must stay exact in f32"
    assert depth < STACK8, f"BVH8 depth {depth} >= {STACK8}"
    return table, depth


# --------------------------------------------------------------------------
# device traversal


def _slab8(row, o, inv_d, t_best):
    """Robust slab test of the 8 child boxes in an interior row.

    Returns (N, 8) bool hit mask (gamma(3)-widened, bounds.rs:198-232
    semantics; NaN axes from 0*inf are non-constraining like bvh._slab_test).
    """
    g = 1.0 + 2.0 * pm.gamma(3)
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    ix, iy, iz = inv_d[:, 0:1], inv_d[:, 1:2], inv_d[:, 2:3]

    def axis(lo, hi, oc, ic):
        t0 = (lo - oc) * ic
        t1 = (hi - oc) * ic
        nan_ax = jnp.isnan(t0) | jnp.isnan(t1)
        tn = jnp.where(nan_ax, -jnp.inf, jnp.minimum(t0, t1))
        tf = jnp.where(nan_ax, jnp.inf, jnp.maximum(t0, t1) * g)
        return tn, tf

    nx, fx = axis(row[:, 0:8], row[:, 24:32], ox, ix)
    ny, fy = axis(row[:, 8:16], row[:, 32:40], oy, iy)
    nz, fz = axis(row[:, 16:24], row[:, 40:48], oz, iz)
    tn = jnp.maximum(jnp.maximum(nx, ny), nz)
    tf = jnp.minimum(jnp.minimum(fx, fy), fz)
    return (tn <= tf) & (tf > 0.0) & (tn < t_best[:, None])


def bvh8_intersect(table, o, d, t_max, any_hit: bool = False,
                   count_steps: bool = False):
    """Lockstep BVH8 traversal: ONE (N, 64) row gather per iteration.

    table: (R, 64) device table from build_bvh8. Returns the
    intersect_brute-style hit dict, or (N,) bool occlusion for any_hit.
    Lanes with t_max <= 0 are dead on entry (compaction: sorted dead
    chunks terminate their while_loop immediately).
    """
    n = o.shape[0]
    f32 = jnp.float32
    i32 = jnp.int32
    table = jnp.asarray(table)  # host numpy when called outside TracedScene
    inv_d = 1.0 / d
    oct_ = ((d[:, 0] < 0).astype(i32) * 4 + (d[:, 1] < 0).astype(i32) * 2
            + (d[:, 2] < 0).astype(i32))

    # root: static row 0 (no gather)
    root = table[0]
    root_hits = _slab8(jnp.broadcast_to(root[None, :], (n, W8)), o, inv_d,
                       t_max)
    bitvals = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], i32)
    mask0 = jnp.sum(root_hits.astype(i32) * bitvals[None, :], axis=1)
    # dead-on-entry: t_max <= 0 lanes start with no work, so a chunk of
    # all-dead lanes (compaction sorts them together) exits its while_loop
    # without one iteration
    mask0 = jnp.where(t_max > 0.0, mask0, 0)
    base0 = jnp.broadcast_to(root[48].astype(i32), (n,))

    state = dict(
        cur_base=base0,
        cur_mask=mask0,
        sb=jnp.zeros((STACK8, n), i32),
        sm=jnp.zeros((STACK8, n), i32),
        sp=jnp.zeros((n,), i32),
        t_best=t_max,
        tri=jnp.zeros((n,), i32),
        b=jnp.zeros((n, 3), f32),
        found=jnp.zeros((n,), bool),
    )
    if count_steps:
        state["steps"] = jnp.zeros((n,), i32)

    def live_mask(st):
        live = (st["cur_mask"] != 0) | (st["sp"] > 0)
        if any_hit:
            live = live & ~st["found"]
        return live

    def body(st):
        live = live_mask(st)
        # pop where the in-hand mask is exhausted (register-stack shift:
        # all elementwise, no per-lane indexing)
        do_pop = (st["cur_mask"] == 0) & (st["sp"] > 0) & live
        sb, sm = st["sb"], st["sm"]
        cur_base = jnp.where(do_pop, sb[0], st["cur_base"])
        cur_mask = jnp.where(do_pop, sm[0], st["cur_mask"])
        sb = jnp.where(do_pop[None, :],
                       jnp.concatenate([sb[1:], sb[:1] * 0], axis=0), sb)
        sm = jnp.where(do_pop[None, :],
                       jnp.concatenate([sm[1:], sm[:1] * 0], axis=0), sm)
        sp = jnp.where(do_pop, st["sp"] - 1, st["sp"])
        act = live & (cur_mask != 0)

        # extract the next child in approximate front-to-back order:
        # visit slot = k XOR ray_octant, first k whose slot bit is set
        slot = jnp.zeros((n,), i32)
        got = jnp.zeros((n,), bool)
        for k in range(8):
            s_k = jnp.bitwise_xor(jnp.full((n,), k, i32), oct_)
            hit_k = (cur_mask >> s_k) & 1
            take = (~got) & (hit_k == 1)
            slot = jnp.where(take, s_k, slot)
            got = got | take
        cur_mask = cur_mask & ~(1 << slot)
        child = jnp.where(act, cur_base + slot, 0)

        row = table[child]  # THE one gather per iteration
        is_leaf = row[:, 63] > 0.5

        # --- leaf: 6 inline watertight tests
        t_best, tri, b, found = st["t_best"], st["tri"], st["b"], st["found"]
        lact = act & is_leaf
        for j in range(LEAF8):
            t_j, b_j, h_j = watertight_hit_diag(
                o, d, t_best, row[:, 9 * j:9 * j + 3],
                row[:, 9 * j + 3:9 * j + 6], row[:, 9 * j + 6:9 * j + 9])
            id_j = row[:, 54 + j].astype(i32)
            take = lact & h_j & (id_j >= 0)
            t_best = jnp.where(take, t_j, t_best)
            tri = jnp.where(take, id_j, tri)
            b = jnp.where(take[:, None], b_j, b)
            found = found | take

        # --- interior: slab-test the 8 grandchildren, descend
        iact = act & ~is_leaf
        hits = _slab8(row, o, inv_d, t_best) & iact[:, None]
        new_mask = jnp.sum(hits.astype(i32) * bitvals[None, :], axis=1)
        new_base = row[:, 48].astype(i32)
        descend = iact & (new_mask != 0)
        # push the remainder of the in-hand entry when descending
        push = descend & (cur_mask != 0)
        sb = jnp.where(push[None, :],
                       jnp.concatenate([cur_base[None], sb[:-1]], axis=0), sb)
        sm = jnp.where(push[None, :],
                       jnp.concatenate([cur_mask[None], sm[:-1]], axis=0), sm)
        sp = jnp.where(push, sp + 1, sp)
        cur_base = jnp.where(descend, new_base, cur_base)
        cur_mask = jnp.where(descend, new_mask, cur_mask)

        out = dict(cur_base=cur_base, cur_mask=cur_mask, sb=sb, sm=sm,
                   sp=sp, t_best=t_best, tri=tri, b=b, found=found)
        if count_steps:
            out["steps"] = st["steps"] + live.astype(i32)
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


def bvh8_intersect_chunked(table, o, d, t_max, chunks: int = 4,
                           any_hit: bool = False,
                           count_steps: bool = False):
    """Independent sub-wave loops (the TPU runtime overlaps them; see
    bvh.bvh_intersect_chunked). Each chunk's while_loop trips to its own
    slowest lane, so rays pre-sorted by expected cost (and dead lanes
    pushed to tail chunks) cut total iterations. count_steps (closest-hit
    only) adds per-lane iteration counts for use as the next sort key."""
    n = o.shape[0]
    if chunks <= 1 or n < 4096 * chunks or n % chunks != 0:
        return bvh8_intersect(table, o, d, t_max, any_hit=any_hit,
                              count_steps=count_steps and not any_hit)
    c = n // chunks
    outs = [bvh8_intersect(table, o[i * c:(i + 1) * c], d[i * c:(i + 1) * c],
                           t_max[i * c:(i + 1) * c], any_hit=any_hit,
                           count_steps=count_steps and not any_hit)
            for i in range(chunks)]
    if any_hit:
        return jnp.concatenate(outs)
    return {k: jnp.concatenate([h[k] for h in outs]) for k in outs[0]}
