"""32-wide BVH with 256-float rows: the small-table gather regime.

Measured TPU facts driving this layout (tools/probe_gather_width{,2,3}.py):

- XLA row-gather cost is per ROW, flat in width from 4 to 256 f32.
- Tables under ~12k rows AND ~12 MB gather at ~7 ns/row/lane; above
  either bound the cost doubles to ~12-13 ns (cache-regime cliff).
- Chained (dependent) gathers hit the same rate, so traversal cost is
  iterations x 7 ns x lanes.

A 32-wide tree with 25-triangle merged leaves holds a 123.6k-tri scene
in ~7k rows x 1 KB ~= 7 MB — inside the fast regime — and needs ~3
interior levels, cutting rows-gathered-per-ray by ~4-6x vs the 8-wide
64-float layout (attic/accel/bvh8.py) on top of the ~1.7x cheaper
gathers.

Per-step cost attribution on hardware (tools/probe_step_cost.py ->
PROBE_STEP.json, 65k lanes, Sponza 8,676-row table): leaf tests were
96% of step cost in the original sequential 25-deep running-min form
(9.05 of 9.38 ms/step); the gather is only 0.55 ms/step and the 32-wide
slab test 0.69. Leaf mode "batched" (ONE watertight call over an
(N, 25) middle axis + min-reduce, _leaf_batched) cuts the step to
2.09 ms -> whole-wave closest 178.7 -> 38.7 ms, chunked-8 23.3 ms;
any-hit 142.7 -> 18.5 ms chunked (cheaper than closest, as it should
be). NEGATIVE result, do not retry: restating the 25 tests as
independent flat-(N,) column tests stacked to (25, N) and axis-0
reduced ("batchedc", perfect lane utilization on paper) measured
172.8 ms — as slow as the sequential chain. Mosaic does not merge
independent unrolled op sequences; ONE wide op sequence over a padded
(N, 25) axis beats 25 perfectly-laid-out narrow ones by 4.5x.

Layout (one (R, 256) f32 table, self-describing rows):

  INTERIOR row: 32 children's slabs component-major
      [bminx(32) bminy(32) bminz(32) bmaxx(32) bmaxy(32) bmaxz(32)] = 192
      [192] base child row, [193] occupancy bits 0-15, [194] bits 16-31
      (children are stored COMPACTLY in ascending-slot order: child row =
      base + popcount(occ & ((1 << slot) - 1)) — no empty rows, so the
      table stays in the small-fast-gather regime)
      [255] kind = 0
  LEAF row (max 25 inline triangles, COMPONENT-major):
      [25*c + j] component c of tri j, c in (p0x p0y p0z p1x .. p2z) —
      so each of the 9 vertex components is one contiguous (N, 25)
      slice of the gathered row (the batched leaf test consumes flat
      column blocks; a vertex-major [9j..9j+9) layout would force 9
      stride-9 re-slices or (N, 25, 3) intermediates whose minor dim
      pads 3 -> 128 lanes). [225+j] global tri id (-1 pad),
      [255] kind = 1

Approximate front-to-back ordering generalizes the BVH8 octant trick to
a 5-bit XOR-permutable slot code: bits [4,3,2] = the child centroid's
octant vs the node center (x, y, z), bits [1,0] = FINE half-axis bits
(x resp. y vs the midpoint of the child's own x/y half — quartile
planes). Every bit is a "which side of an axis plane" predicate, so one
per-ray 5-bit mask (sign of d.x on bits 4 and 1, d.y on 3 and 0, d.z on
2) XOR-flips the whole code into approximate near-to-far order.
Traversal builds each node's hit mask directly in PERMUTED bit order
(bit p = slot XOR ray_mask5), so "next child" is count-trailing-zeros —
two elementwise ops via population_count — and children are consumed
near-x-half first, then near-y, near-z, fine-x, fine-y. Children
colliding on a code overflow to the free slot with the smallest XOR
distance (integer-valued, so coarse-bit damage outweighs fine-bit).

Replaces the reference's per-ray recursive BVH::intersect
(accelerator.rs:358-475) as the TPU device traversal; the host build
reuses the binary SAH builder (accel/bvh.py, accelerator.rs:206-267
semantics) and collapses it 32-wide.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.intersect import watertight_cols_pre, watertight_hit_cols
from ..core import math as pm
from .bvh import build_bvh

BW = 32           # branching
WW = 256          # row width (f32)
LEAFW = 25        # max inline triangles per leaf row
STACKW = 10       # collapse asserts depth < STACKW


def build_bvhw(p0, p1, p2, max_leaf: int = 4):
    """Triangle soup -> (table (R, 256) f32, order (F,), depth).

    Builds the binary SAH tree (host numpy / C++) and collapses it.
    Leaf rows index the REORDERED arrays (apply ``order`` first).
    """
    b = build_bvh(np.asarray(p0), np.asarray(p1), np.asarray(p2),
                  min(max_leaf, LEAFW))
    p0r = np.asarray(p0, np.float32)[b.order]
    p1r = np.asarray(p1, np.float32)[b.order]
    p2r = np.asarray(p2, np.float32)[b.order]
    table, depth = bvhw_from_binary(b, p0r, p1r, p2r)
    return table, b.order, depth


def bvhw_from_binary(b, p0r, p1r, p2r):
    """Collapse a built binary BVH (accel/bvh.BVHArrays) into the 32-wide
    row table; same algorithm as attic/accel/bvh8.bvh8_from_binary with
    the branching and leaf capacity widened and the slot policy upgraded
    from 8 octant groups to the 5-bit XOR code (module docstring).
    p0r/p1r/p2r are the triangle vertices ALREADY permuted into
    ``b.order``. Returns (table (R, 256) f32, depth)."""
    bmin = np.asarray(b.bounds_min, np.float32)
    bmax = np.asarray(b.bounds_max, np.float32)
    off = np.asarray(b.offset, np.int64)
    npr = np.asarray(b.n_prims, np.int64)
    p0r = np.asarray(p0r, np.float32)
    p1r = np.asarray(p1r, np.float32)
    p2r = np.asarray(p2r, np.float32)
    assert npr.max(initial=0) <= LEAFW, "binary leaves must fit a leaf row"
    ext = np.maximum(bmax - bmin, 0.0)
    sa = (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
          + ext[:, 2] * ext[:, 0])
    # subtree (start, count) via pre-order flattening (python lists: numpy
    # scalar indexing in this 2F loop costs ~10 s at 123k tris)
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
        """(K,) node ids (subtree_n <= LEAFW) -> (K, 256) leaf rows."""
        k = len(nodes)
        r = np.zeros((k, WW), np.float32)
        o = subtree_s[nodes]
        cnt = subtree_n[nodes]
        for j in range(LEAFW):
            have = j < cnt
            tri = np.where(have, o + j, 0)
            for c in range(9):
                src = (p0r, p1r, p2r)[c // 3]
                r[:, LEAFW * c + j] = np.where(have, src[tri, c % 3], 0.0)
            r[:, 9 * LEAFW + j] = np.where(have, tri.astype(np.float32), -1.0)
        r[:, 255] = 1.0
        return r

    idx_chunks: list[np.ndarray] = []
    val_chunks: list[np.ndarray] = []
    alloc = 1  # row 0 = root
    depth = 1

    if subtree_n[0] <= LEAFW:
        # degenerate: whole scene fits one leaf -> root with a single child
        r = np.zeros(WW, np.float32)
        r[0:192] = np.inf
        r[0], r[32], r[64] = bmin[0]
        r[96], r[128], r[160] = bmax[0]
        r[192] = np.float32(alloc)
        r[193] = 1.0  # occupancy: slot 0 only
        idx_chunks.append(np.asarray([0, alloc], np.int64))
        val_chunks.append(np.stack([r, leaf_rows_vec(np.asarray([0]))[0]]))
        alloc += 1
    else:
        frontier = np.asarray([0], np.int64)       # binary node ids
        frontier_rows = np.asarray([0], np.int64)  # their table rows
        while len(frontier):
            fn = len(frontier)
            ar = np.arange(fn)
            # --- split each node into <= 32 clusters: repeatedly split
            # the splittable cluster (interior subtree > LEAFW tris) with
            # the largest surface area. cl: (F, 32), -1 = empty.
            cl = np.full((fn, BW), -1, np.int64)
            cl[:, 0] = frontier
            cnt = np.ones(fn, np.int64)
            for _ in range(BW - 1):
                cls = np.clip(cl, 0, None)
                can = (cl >= 0) & (subtree_n[cls] > LEAFW)
                sa_c = np.where(can, sa[cls], -np.inf)
                j = np.argmax(sa_c, axis=1)
                do = can[ar, j] & (cnt < BW)
                node = cl[ar, j]
                sel = ar[do]
                cl[sel, j[do]] = node[do] + 1        # first child
                cl[sel, cnt[do]] = off[node[do]]     # second child
                cnt[do] += 1
            # contested slot codes go to the child likeliest to be hit:
            # assign in descending surface-area order
            sa_cl = np.where(cl >= 0, sa[np.clip(cl, 0, None)], -np.inf)
            cl = np.take_along_axis(cl, np.argsort(-sa_cl, axis=1), axis=1)
            have = cl >= 0
            cls = np.clip(cl, 0, None)
            # --- 5-bit slot-code assignment: bits [4,3,2] = centroid
            # octant vs node center, bits [1,0] = x/y vs the quartile
            # plane of the child's own half (every bit a sign-of-axis
            # predicate, so the traversal's ray mask XOR-flips the code
            # into near-to-far order). Colliding children take the free
            # slot with the smallest integer XOR distance (candidate k-th
            # choice for pref p is simply p XOR k).
            centers = 0.5 * (bmin[cls] + bmax[cls])          # (F, 32, 3)
            nc = 0.5 * (bmin[frontier] + bmax[frontier])     # (F, 3)
            next_ = (bmax[frontier] - bmin[frontier])        # (F, 3)
            hx = centers[..., 0] > nc[:, None, 0]
            hy = centers[..., 1] > nc[:, None, 1]
            hz = centers[..., 2] > nc[:, None, 2]
            qx = nc[:, None, 0] + np.where(hx, 0.25, -0.25) * next_[:, None, 0]
            qy = nc[:, None, 1] + np.where(hy, 0.25, -0.25) * next_[:, None, 1]
            prefs = (hx * 16 + hy * 8 + hz * 4
                     + (centers[..., 0] > qx) * 2
                     + (centers[..., 1] > qy)).astype(np.int64)
            taken = np.zeros((fn, BW), bool)
            slots = np.full((fn, BW), -1, np.int64)
            for i in range(BW):
                assigned = np.full(fn, -1, np.int64)
                for k in range(BW):
                    s = prefs[:, i] ^ k
                    free = (assigned < 0) & have[:, i] & ~taken[ar, s]
                    assigned = np.where(free, s, assigned)
                    taken[ar[free], s[free]] = True
                slots[:, i] = assigned
            # --- emit this level's interior rows (children allocated
            # COMPACTLY in ascending-slot order; occupancy mask stored)
            sel = slots[have]
            src = cl[have]
            fi = np.broadcast_to(ar[:, None], (fn, BW))[have]
            occm = np.zeros((fn, BW), bool)
            occm[fi, sel] = True
            n_child = occm.sum(axis=1)
            bases = alloc + np.concatenate(
                [[0], np.cumsum(n_child)[:-1]]).astype(np.int64)
            alloc += int(n_child.sum())
            rank = np.cumsum(occm, axis=1) - occm  # exclusive by-slot rank
            occ_bits = (occm.astype(np.uint64)
                        << np.arange(BW, dtype=np.uint64)).sum(axis=1)
            rows_i = np.zeros((fn, WW), np.float32)
            rows_i[:, 0:192] = np.inf  # empty slots: +inf boxes
            for comp, arr in enumerate((bmin[src][:, 0], bmin[src][:, 1],
                                        bmin[src][:, 2], bmax[src][:, 0],
                                        bmax[src][:, 1], bmax[src][:, 2])):
                rows_i[fi, BW * comp + sel] = arr
            rows_i[:, 192] = bases.astype(np.float32)
            rows_i[:, 193] = (occ_bits & 0xFFFF).astype(np.float32)
            rows_i[:, 194] = (occ_bits >> 16).astype(np.float32)
            idx_chunks.append(frontier_rows)
            val_chunks.append(rows_i)
            # --- children: leaves emit now, interiors join the frontier
            child_rows = bases[fi] + rank[fi, sel]
            is_leaf_c = subtree_n[src] <= LEAFW
            leaf_nodes = src[is_leaf_c]
            if len(leaf_nodes):
                idx_chunks.append(child_rows[is_leaf_c])
                val_chunks.append(leaf_rows_vec(leaf_nodes))
            frontier = src[~is_leaf_c]
            frontier_rows = child_rows[~is_leaf_c]
            if len(frontier):
                depth += 1

    table = np.zeros((alloc, WW), np.float32)
    table[np.concatenate(idx_chunks)] = np.concatenate(val_chunks)
    assert table.shape[0] < (1 << 24), "row refs must stay exact in f32"
    assert len(p0r) < (1 << 24), "leaf tri ids must stay exact in f32"
    assert depth < STACKW, f"BVH32 depth {depth} >= {STACKW}"
    return table, depth


# --------------------------------------------------------------------------
# device traversal


def _slab32(row, oc96, ic96, t_best):
    """Robust slab test of the 32 child boxes in an interior row.

    (N, 32) bool, gamma(3)-widened (bounds.rs:198-232 semantics); NaN
    axes from 0*inf are non-constraining like bvh._slab_test.

    Wide form: the row's lo/hi slab halves are contiguous 96-float
    blocks ([bminx(32) bminy(32) bminz(32)] / [bmax...]), so the bulk of
    the arithmetic runs on (N, 96) arrays (96 -> 128 lane pad, 1.33x)
    against per-ray origin/inv-dir blocks hoisted out of the traversal
    loop (oc96/ic96 = each component broadcast to its 32-lane block) —
    only the final 3-way max/min reduces on (N, 32) slices (32 -> 128,
    4x pad), instead of every one of the ~18 ops paying the 4x."""
    g = 1.0 + 2.0 * pm.gamma(3)
    lo = (row[:, 0:96] - oc96) * ic96
    hi = (row[:, 96:192] - oc96) * ic96
    nan_ax = jnp.isnan(lo) | jnp.isnan(hi)
    tn96 = jnp.where(nan_ax, -jnp.inf, jnp.minimum(lo, hi))
    tf96 = jnp.where(nan_ax, jnp.inf, jnp.maximum(lo, hi) * g)
    tn = jnp.maximum(jnp.maximum(tn96[:, 0:32], tn96[:, 32:64]),
                     tn96[:, 64:96])
    tf = jnp.minimum(jnp.minimum(tf96[:, 0:32], tf96[:, 32:64]),
                     tf96[:, 64:96])
    return (tn <= tf) & (tf > 0.0) & (tn < t_best[:, None])


def _traverse_setup(table, o, d, t_max, count_steps, stackw=STACKW):
    """Per-(sub-)wave traversal state + ray-geometry pack shared by the
    plain and interleaved drivers.

    stackw: stack rows carried through the while_loop. Interior->interior
    descends push at most (tree depth - 1) times, so callers that know
    the build depth (TracedScene.bw_depth) size the stack exactly —
    Sponza's depth-3 tree carries 3 rows instead of 10, cutting the
    per-step stack-shift traffic ~3x."""
    n = o.shape[0]
    f32 = jnp.float32
    i32 = jnp.int32
    u32 = jnp.uint32
    inv_d = 1.0 / d
    # per-ray 5-bit slot-code mask: sign of d.x flips bits 4 and 1 (16+2),
    # d.y bits 3 and 0 (8+1), d.z bit 2 (4) — XORing a slot code with this
    # puts the PERMUTED mask in approximate near-to-far bit order, so
    # next-child = count-trailing-zeros is front-to-back
    mask5 = ((d[:, 0] < 0).astype(i32) * 18
             + (d[:, 1] < 0).astype(i32) * 9
             + (d[:, 2] < 0).astype(i32) * 4)
    slot_ids = jnp.arange(BW, dtype=i32)[None, :]                  # (1, 32)
    perm = jnp.bitwise_xor(slot_ids, mask5[:, None])               # (N, 32)
    bitvals = (jnp.uint32(1) << perm.astype(u32))                  # (N, 32)
    # per-ray slab-test blocks, hoisted: component c broadcast to the
    # row's 32-lane block c (the wide _slab32 form consumes these)
    oc96 = jnp.concatenate(
        [jnp.broadcast_to(o[:, i:i + 1], (n, BW)) for i in range(3)], axis=1)
    ic96 = jnp.concatenate(
        [jnp.broadcast_to(inv_d[:, i:i + 1], (n, BW)) for i in range(3)],
        axis=1)
    geom = dict(o=o, d=d, inv_d=inv_d, mask5=mask5, bitvals=bitvals,
                oc96=oc96, ic96=ic96)

    # per-ray watertight shear constants, hoisted out of the loop as flat
    # (N,) columns: the "cols" leaf mode never touches an (N, 3) array —
    # XLA tiles rank-2 f32 as (8, 128) on the minor dims, so narrow
    # (N, 3) intermediates pad 3 -> 128 lanes (42x VPU waste)
    geom["cols"] = watertight_cols_pre(o, d)

    root = table[0]
    root_hits = _slab32(root[None, :], oc96, ic96, t_max)
    mask0 = jnp.sum(jnp.where(root_hits, bitvals, jnp.uint32(0)), axis=1,
                    dtype=u32)
    mask0 = jnp.where(t_max > 0.0, mask0, jnp.uint32(0))  # dead on entry
    st = dict(
        cur_base=jnp.broadcast_to(root[192].astype(i32), (n,)),
        cur_mask=mask0,
        cur_occ=jnp.broadcast_to(
            root[193].astype(u32) | (root[194].astype(u32) << 16), (n,)),
        sb=jnp.zeros((stackw, n), i32),
        sm=jnp.zeros((stackw, n), u32),
        so=jnp.zeros((stackw, n), u32),
        sp=jnp.zeros((n,), i32),
        t_best=t_max,
        tri=jnp.zeros((n,), i32),
        # barycentrics as FLAT columns: the (N, 3) form would pad its
        # minor dim 3 -> 128 in every per-triangle where-update
        b0=jnp.zeros((n,), f32),
        b1=jnp.zeros((n,), f32),
        b2=jnp.zeros((n,), f32),
        found=jnp.zeros((n,), bool),
    )
    if count_steps:
        st["steps"] = jnp.zeros((n,), i32)
    return st, geom


def _anyhit_slim(st, geom):
    """Occlusion queries never report t/tri/barycentrics: drop them from
    the loop carry (t_max still bounds the slab/leaf tests, but it is
    loop-INVARIANT for any-hit, so it rides in geom instead of state)."""
    geom = dict(geom, t_max=st["t_best"])
    st = {k: v for k, v in st.items()
          if k not in ("t_best", "tri", "b0", "b1", "b2")}
    return st, geom


def _traverse_live(st, any_hit):
    live = (st["cur_mask"] != 0) | (st["sp"] > 0)
    if any_hit:
        live = live & ~st["found"]
    return live


def _leaf_chain(geom, t_best, row, lact, tri, bc, found):
    """25 inline watertight tests as a sequential running-min chain,
    all-columns form (watertight_hit_cols): no (N, 3) intermediates."""
    i32 = jnp.int32
    b0, b1, b2 = bc
    pre = geom["cols"]
    for j in range(LEAFW):
        t_j, b0_j, b1_j, b2_j, h_j = watertight_hit_cols(
            pre, t_best, [row[:, LEAFW * k + j] for k in range(9)])
        id_j = row[:, 9 * LEAFW + j].astype(i32)
        take = lact & h_j & (id_j >= 0)
        t_best = jnp.where(take, t_j, t_best)
        tri = jnp.where(take, id_j, tri)
        b0 = jnp.where(take, b0_j, b0)
        b1 = jnp.where(take, b1_j, b1)
        b2 = jnp.where(take, b2_j, b2)
        found = found | take
    return t_best, tri, (b0, b1, b2), found


def _leaf_batched(geom, t_best, row, lact, tri, bc, found):
    """25 leaf tests as ONE broadcast watertight call over a (N, 25)
    minor axis + a min-reduction — no 25-deep where-chain, so the VPU
    sees independent element-wise work instead of a serial dependency.

    All-columns form: the component-major leaf layout makes each of the
    9 vertex components a contiguous (N, 25) slice of the gathered row,
    and the hoisted per-ray shear constants broadcast in as (N, 1) —
    every intermediate is (N, 25), never (N, 25, 3) (whose minor dim
    would pad 3 -> 128 lanes, a 42x VPU waste)."""
    i32 = jnp.int32
    b0, b1, b2 = bc
    pre = {k: v[:, None] for k, v in geom["cols"].items()}
    c9 = [row[:, LEAFW * k:LEAFW * (k + 1)] for k in range(9)]
    ids = row[:, 9 * LEAFW:10 * LEAFW].astype(i32)               # (N, 25)
    t_a, b0_a, b1_a, b2_a, h_a = watertight_hit_cols(
        pre, t_best[:, None], c9)
    h_a = h_a & (ids >= 0) & lact[:, None]
    t_m = jnp.where(h_a, t_a, jnp.inf)                           # (N, 25)
    t_min = jnp.min(t_m, axis=1)
    any_h = t_min < jnp.inf
    # one-hot select of the argmin column (first minimum wins ties) —
    # stays on the VPU, no per-lane small-axis gathers
    first = (t_m == t_min[:, None])
    first = first & (jnp.cumsum(first.astype(i32), axis=1) == 1)
    sel_i = jnp.sum(jnp.where(first, ids, 0), axis=1)
    t_best = jnp.where(any_h, t_min, t_best)
    tri = jnp.where(any_h, sel_i, tri)
    fw = first & any_h[:, None]
    b0 = jnp.where(any_h, jnp.sum(jnp.where(fw, b0_a, 0.0), axis=1), b0)
    b1 = jnp.where(any_h, jnp.sum(jnp.where(fw, b1_a, 0.0), axis=1), b1)
    b2 = jnp.where(any_h, jnp.sum(jnp.where(fw, b2_a, 0.0), axis=1), b2)
    return t_best, tri, (b0, b1, b2), found | any_h


def _leaf_anyhit(geom, t_max, row, lact, found):
    """Occlusion leaf test: hit/no-hit only, no best-hit bookkeeping,
    all-columns form."""
    i32 = jnp.int32
    pre = geom["cols"]
    for j in range(LEAFW):
        _, _, _, _, h_j = watertight_hit_cols(
            pre, t_max, [row[:, LEAFW * k + j] for k in range(9)])
        id_j = row[:, 9 * LEAFW + j].astype(i32)
        found = found | (lact & h_j & (id_j >= 0))
    return found


def _leaf_anyhit_batched(geom, t_max, row, lact, found):
    """Occlusion leaf test over a (N, 25) minor axis: one broadcast
    watertight call + an any-reduction, all-columns form (see
    _leaf_batched). The sequential 25-deep chain was 96% of per-step
    cost on hardware (PROBE_STEP.json attrib_leaf)."""
    i32 = jnp.int32
    pre = {k: v[:, None] for k, v in geom["cols"].items()}
    c9 = [row[:, LEAFW * k:LEAFW * (k + 1)] for k in range(9)]
    ids = row[:, 9 * LEAFW:10 * LEAFW].astype(i32)
    _, _, _, _, h_a = watertight_hit_cols(pre, t_max[:, None], c9)
    hit = jnp.any(h_a & (ids >= 0), axis=1)
    return found | (lact & hit)


def _traverse_step(table, st, geom, any_hit, count_steps,
                   leaf_mode="chain",
                   do_leaf=True, do_interior=True, do_stack=True):
    """ONE traversal iteration: pop, gather the child row (THE one gather
    per step), leaf-test or slab-test, push/descend. Shared by
    bvhw_intersect (one while_loop) and bvhw_intersect_il (k sub-waves
    advanced per loop body so their gathers pipeline).

    do_leaf/do_interior/do_stack gate the step's component work — probe
    hooks ONLY (tools/probe_step_cost.py attributes per-step cost to
    gather vs leaf vs slab vs stack); production callers leave them on.
    """
    i32 = jnp.int32
    u32 = jnp.uint32
    o, d, inv_d = geom["o"], geom["d"], geom["inv_d"]
    mask5, bitvals = geom["mask5"], geom["bitvals"]
    n = o.shape[0]

    live = _traverse_live(st, any_hit)
    sb, sm, so = st["sb"], st["sm"], st["so"]
    cur_base, cur_mask, cur_occ = st["cur_base"], st["cur_mask"], st["cur_occ"]
    sp = st["sp"]
    if do_stack:
        do_pop = (cur_mask == 0) & (sp > 0) & live
        cur_base = jnp.where(do_pop, sb[0], cur_base)
        cur_mask = jnp.where(do_pop, sm[0], cur_mask)
        cur_occ = jnp.where(do_pop, so[0], cur_occ)
        sb = jnp.where(do_pop[None, :],
                       jnp.concatenate([sb[1:], sb[:1] * 0], axis=0), sb)
        sm = jnp.where(do_pop[None, :],
                       jnp.concatenate([sm[1:], sm[:1] * 0], axis=0), sm)
        so = jnp.where(do_pop[None, :],
                       jnp.concatenate([so[1:], so[:1] * 0], axis=0), so)
        sp = jnp.where(do_pop, sp - 1, sp)
    act = live & (cur_mask != 0)

    # next child: lowest set PERMUTED bit (approximate front-to-back)
    low = cur_mask & (jnp.uint32(0) - cur_mask)
    p = jax.lax.population_count(low - 1).astype(i32)  # ctz
    p = jnp.minimum(p, 31)  # mask==0 lanes: keep shifts defined
    slot = jnp.bitwise_xor(p, mask5)  # invert the 5-bit code permutation
    cur_mask = cur_mask & (cur_mask - 1)               # clear lowest bit
    # children are stored compactly: row = base + rank of slot among the
    # node's occupied slots
    rank = jax.lax.population_count(
        cur_occ & ((jnp.uint32(1) << slot.astype(u32))
                   - jnp.uint32(1))).astype(i32)
    child = jnp.where(act, cur_base + rank, 0)

    row = table[child]  # THE one gather per iteration
    is_leaf = row[:, 255] > 0.5

    # --- leaf tests
    found = st["found"]
    t_bound = geom["t_max"] if any_hit else st["t_best"]
    lact = act & is_leaf
    if not do_leaf:
        t_best = t_bound
        tri = st.get("tri")
        bc = (st.get("b0"), st.get("b1"), st.get("b2"))
    elif any_hit:
        if leaf_mode == "batched":
            found = _leaf_anyhit_batched(geom, t_bound, row, lact, found)
        else:
            found = _leaf_anyhit(geom, t_bound, row, lact, found)
        t_best = t_bound
    elif leaf_mode == "batched":
        t_best, tri, bc, found = _leaf_batched(
            geom, t_bound, row, lact, st["tri"],
            (st["b0"], st["b1"], st["b2"]), found)
    else:
        t_best, tri, bc, found = _leaf_chain(
            geom, t_bound, row, lact, st["tri"],
            (st["b0"], st["b1"], st["b2"]), found)

    # --- interior: slab-test the 32 grandchildren, descend
    if do_interior:
        iact = act & ~is_leaf
        hits = _slab32(row, geom["oc96"], geom["ic96"], t_best) \
            & iact[:, None]
        new_mask = jnp.sum(jnp.where(hits, bitvals, jnp.uint32(0)), axis=1,
                           dtype=u32)
        new_base = row[:, 192].astype(i32)
        new_occ = row[:, 193].astype(u32) | (row[:, 194].astype(u32) << 16)
        descend = iact & (new_mask != 0)
    else:
        descend = act & ~is_leaf
        new_base = row[:, 192].astype(i32)
        new_mask = jnp.full((n,), 1, u32)
        new_occ = new_mask
    if do_stack:
        push = descend & (cur_mask != 0)
        sb = jnp.where(push[None, :],
                       jnp.concatenate([cur_base[None], sb[:-1]], axis=0),
                       sb)
        sm = jnp.where(push[None, :],
                       jnp.concatenate([cur_mask[None], sm[:-1]], axis=0),
                       sm)
        so = jnp.where(push[None, :],
                       jnp.concatenate([cur_occ[None], so[:-1]], axis=0),
                       so)
        sp = jnp.where(push, sp + 1, sp)

    out = dict(cur_base=jnp.where(descend, new_base, cur_base),
               cur_mask=jnp.where(descend, new_mask, cur_mask),
               cur_occ=jnp.where(descend, new_occ, cur_occ),
               sb=sb, sm=sm, so=so, sp=sp, found=found)
    if not any_hit:
        out.update(t_best=t_best, tri=tri,
                   b0=bc[0], b1=bc[1], b2=bc[2])
    if count_steps:
        out["steps"] = st["steps"] + live.astype(i32)
    return out


def _traverse_result(final, any_hit, count_steps):
    if any_hit:
        return (final["found"], final["steps"]) if count_steps \
            else final["found"]
    valid = final["found"]
    out = dict(valid=valid, t=jnp.where(valid, final["t_best"], 0.0),
               tri=final["tri"],
               b=jnp.stack([final["b0"], final["b1"], final["b2"]],
                           axis=-1))
    if count_steps:
        out["steps"] = final["steps"]
    return out


def bvhw_intersect(table, o, d, t_max, any_hit: bool = False,
                   count_steps: bool = False, stackw: int = STACKW,
                   leaf_mode: str = "batched"):
    """Lockstep BVH32 traversal: ONE (N, 256) row gather per iteration.

    table: (R, 256) device table from build_bvhw. Returns the
    intersect_brute-style hit dict, or (N,) bool occlusion for any_hit.
    Lanes with t_max <= 0 are dead on entry (wavefront compaction).
    """
    table = jnp.asarray(table)
    st, geom = _traverse_setup(table, o, d, t_max, count_steps,
                               stackw=stackw)
    if any_hit:
        st, geom = _anyhit_slim(st, geom)
    final = jax.lax.while_loop(
        lambda s: jnp.any(_traverse_live(s, any_hit)),
        lambda s: _traverse_step(table, s, geom, any_hit, count_steps,
                                 leaf_mode=leaf_mode),
        st)
    return _traverse_result(final, any_hit, count_steps)


def bvhw_intersect_il(table, o, d, t_max, k: int = 2,
                      any_hit: bool = False, count_steps: bool = False,
                      stackw: int = STACKW, leaf_mode: str = "batched"):
    """INTERLEAVED traversal: k independent sub-waves advance inside ONE
    while_loop body, so their k row gathers (distinct gather ops with no
    data dependency) pipeline on the gather engine — measured ~5.2
    ns/row/lane at k=2 vs ~7 solo (tools/probe_gather_width3.py). The
    loop trips to the slowest sub-wave; callers pre-sort rays by
    expected cost so contiguous sub-waves finish together.
    """
    n = o.shape[0]
    assert n % k == 0
    c = n // k
    table = jnp.asarray(table)
    subs = [_traverse_setup(table, o[i * c:(i + 1) * c],
                            d[i * c:(i + 1) * c], t_max[i * c:(i + 1) * c],
                            count_steps, stackw=stackw)
            for i in range(k)]
    if any_hit:
        subs = [_anyhit_slim(s, g) for s, g in subs]
    geoms = [g for _, g in subs]

    def cond(sts):
        alive = jnp.any(_traverse_live(sts[0], any_hit))
        for i in range(1, k):
            alive = alive | jnp.any(_traverse_live(sts[i], any_hit))
        return alive

    def body(sts):
        return tuple(_traverse_step(table, sts[i], geoms[i], any_hit,
                                    count_steps, leaf_mode=leaf_mode)
                     for i in range(k))

    finals = jax.lax.while_loop(cond, body, tuple(s for s, _ in subs))
    outs = [_traverse_result(f, any_hit, count_steps) for f in finals]
    if any_hit:
        if count_steps:
            return (jnp.concatenate([t[0] for t in outs]),
                    jnp.concatenate([t[1] for t in outs]))
        return jnp.concatenate(outs)
    return {key: jnp.concatenate([h[key] for h in outs])
            for key in outs[0]}


def bvhw_intersect_chunked(table, o, d, t_max, chunks: int = 4,
                           any_hit: bool = False,
                           count_steps: bool = False,
                           interleave: int = 1, stackw: int = STACKW,
                           leaf_mode: str = "batched"):
    """Independent sub-wave loops (the TPU runtime overlaps them; see
    bvh.bvh_intersect_chunked), optionally k-way interleaved so each
    chunk's gathers pipeline. interleave defaults OFF in the fused
    whole-wave program: the doubled loop body (2 x 25 inline leaf
    tests) made XLA compile time explode when unrolled across bounces.
    Rays pre-sorted by expected cost (dead lanes in tail chunks) cut
    total iterations: each chunk's while_loop trips to its own slowest
    lane."""
    n = o.shape[0]

    def one(o_, d_, t_):
        if interleave > 1 and o_.shape[0] % interleave == 0 \
                and o_.shape[0] >= 2048 * interleave:
            return bvhw_intersect_il(table, o_, d_, t_, k=interleave,
                                     any_hit=any_hit,
                                     count_steps=count_steps and not any_hit,
                                     stackw=stackw, leaf_mode=leaf_mode)
        return bvhw_intersect(table, o_, d_, t_, any_hit=any_hit,
                              count_steps=count_steps and not any_hit,
                              stackw=stackw, leaf_mode=leaf_mode)

    if chunks <= 1 or n < 4096 * chunks or n % chunks != 0:
        return one(o, d, t_max)
    c = n // chunks
    outs = [one(o[i * c:(i + 1) * c], d[i * c:(i + 1) * c],
                t_max[i * c:(i + 1) * c])
            for i in range(chunks)]
    if any_hit:
        return jnp.concatenate(outs)
    return {k: jnp.concatenate([h[k] for h in outs]) for k in outs[0]}
