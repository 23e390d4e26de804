"""BVH: host-side SAH build → flattened node arrays → device traversal.

Parity with reference ``src/pathtracer/accelerator.rs``: 12-bucket SAH
recursive build with leaf size <= max_prims (:206-267), flattened
depth-first LinearBVHNode layout with second-child offsets (:309-346), and
iterative front-to-back traversal with a 64-deep stack ordered by the ray
direction sign on the split axis (:358-475). The build runs on host
(numpy; accel/cpp provides a C++ builder for huge scenes), the traversal
runs on device as a lane-parallel ``lax.while_loop``: every ray pops one
node per iteration, interior hits push children far-first, leaf hits run
the watertight triangle test on up to ``max_leaf`` primitives.

Triangles are REORDERED during the build so each leaf's primitives are
contiguous; the permutation is returned so the caller reorders the packed
scene arrays once (no extra indirection at trace time).
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as pm
from ..ops.intersect import watertight_hit_diag, _take3

N_BUCKETS = 12
STACK_DEPTH = 64


class _HashableArray:
    """Host-side array carried as jit-static aux data (hashed by identity)."""

    def __init__(self, a):
        self.a = a

    def __hash__(self):
        return id(self.a)

    def __eq__(self, other):
        return self.a is getattr(other, "a", None)


@dataclasses.dataclass
class BVHArrays:
    """Flattened BVH as device arrays (SoA LinearBVHNode).

    ``nodes`` packs every per-node field into one (M, 12) f32 row
    [bmin, bmax, offset, n_prims, axis, pad] so traversal does ONE row
    gather per pop instead of five (TPU gathers are the traversal
    bottleneck; int fields ride as exact f32 — offsets are asserted
    < 2^24 at build)."""

    bounds_min: jnp.ndarray  # (M, 3)
    bounds_max: jnp.ndarray  # (M, 3)
    offset: jnp.ndarray  # (M,) prims-offset (leaf) or second-child (interior)
    n_prims: jnp.ndarray  # (M,) 0 for interior nodes
    axis: jnp.ndarray  # (M,) split axis of interior nodes
    order: np.ndarray  # (F,) host-side triangle permutation applied
    max_leaf: int
    nodes: jnp.ndarray = None  # (M, 8) packed rows


def _pack_nodes(bmin, bmax, off, npr, ax) -> jnp.ndarray:
    """(M, 8) rows [bmin bmax offset meta], meta = n_prims*4 + axis.

    8-wide instead of the naive 12: per-pop gather traffic is the
    traversal bottleneck, and all int fields stay exact in f32 (offsets
    asserted < 2^24 at build; meta <= max_leaf*4+2)."""
    bmin = np.asarray(bmin, np.float32)
    m = bmin.shape[0]
    assert m < (1 << 24), "node offsets must stay exact in f32"
    meta = np.asarray(npr, np.int64) * 4 + np.asarray(ax, np.int64)
    cols = np.concatenate([
        bmin, np.asarray(bmax, np.float32),
        np.asarray(off, np.float32)[:, None],
        meta.astype(np.float32)[:, None],
    ], axis=1)
    return jnp.asarray(cols)


jax.tree_util.register_pytree_node(
    BVHArrays,
    lambda b: ((b.bounds_min, b.bounds_max, b.offset, b.n_prims, b.axis,
                b.nodes),
               (_HashableArray(b.order), b.max_leaf)),
    lambda aux, kids: BVHArrays(*kids[:5], order=aux[0].a, max_leaf=aux[1],
                                nodes=kids[5]),
)


def build_bvh(p0: np.ndarray, p1: np.ndarray, p2: np.ndarray,
              max_prims: int = 4, native: bool | None = None) -> BVHArrays:
    """12-bucket SAH build over triangle bounds (host).

    Uses the C++ builder (accel/cpp) when available — required for
    Sponza-scale meshes; falls back to the numpy reference implementation.
    """
    if native is None:
        native = len(p0) > 20_000
    if native:
        from . import cpp
        if cpp.available():
            bmin, bmax, off, npr, ax, order = cpp.build(
                np.asarray(p0), np.asarray(p1), np.asarray(p2), max_prims)
            return BVHArrays(
                bounds_min=jnp.asarray(bmin), bounds_max=jnp.asarray(bmax),
                offset=jnp.asarray(off), n_prims=jnp.asarray(npr),
                axis=jnp.asarray(ax), order=order, max_leaf=max_prims,
                nodes=_pack_nodes(bmin, bmax, off, npr, ax))
    f = len(p0)
    lo = np.minimum(np.minimum(p0, p1), p2).astype(np.float32)
    hi = np.maximum(np.maximum(p0, p1), p2).astype(np.float32)
    centroid = 0.5 * (lo + hi)

    nb_min: list[np.ndarray] = []
    nb_max: list[np.ndarray] = []
    noffset: list[int] = []
    nprims: list[int] = []
    naxis: list[int] = []
    order: list[np.ndarray] = []
    n_ordered = 0

    def sa(e):
        return 2.0 * (e[0] * e[1] + e[1] * e[2] + e[2] * e[0])

    def emit(b_lo, b_hi, off, np_, ax):
        nb_min.append(b_lo)
        nb_max.append(b_hi)
        noffset.append(off)
        nprims.append(np_)
        naxis.append(ax)
        return len(nb_min) - 1

    rec_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(rec_limit, 10_000 + f))

    def build(prims) -> int:
        nonlocal n_ordered
        b_lo = lo[prims].min(0)
        b_hi = hi[prims].max(0)

        def leaf():
            nonlocal n_ordered
            idx = emit(b_lo, b_hi, n_ordered, len(prims), 0)
            order.append(prims)
            n_ordered += len(prims)
            return idx

        if len(prims) <= max_prims:
            return leaf()
        c = centroid[prims]
        c_lo, c_hi = c.min(0), c.max(0)
        extent = c_hi - c_lo
        axis = int(np.argmax(extent))
        # Degenerate centroid bounds (coincident centroids) must still
        # SPLIT, not leaf: traversal only tests max_leaf prims per leaf,
        # so an oversized leaf would silently drop hits. best_split stays
        # -1 and the equal-count median path below applies.
        best_cost, best_split = np.inf, -1
        if extent[axis] > 0:
            scaled = np.minimum(((c[:, axis] - c_lo[axis]) / extent[axis]
                                 * N_BUCKETS).astype(np.int32), N_BUCKETS - 1)
            bl, bh = lo[prims], hi[prims]
            for split in range(N_BUCKETS - 1):
                left = scaled <= split
                nl = int(left.sum())
                nr = len(prims) - nl
                if nl == 0 or nr == 0:
                    continue
                cost = 0.125 + (nl * sa(bh[left].max(0) - bl[left].min(0)) +
                                nr * sa(bh[~left].max(0) - bl[~left].min(0))) \
                    / max(sa(b_hi - b_lo), 1e-20)
                if cost < best_cost:
                    best_cost, best_split = cost, split
        if best_split < 0:
            med = np.argsort(c[:, axis], kind="stable")
            half = len(prims) // 2
            li, ri = prims[med[:half]], prims[med[half:]]
        else:
            mask = scaled <= best_split
            li, ri = prims[mask], prims[~mask]

        node = emit(b_lo, b_hi, 0, 0, axis)
        left_idx = build(li)
        assert left_idx == node + 1
        right_idx = build(ri)
        noffset[node] = right_idx
        return node

    build(np.arange(f))
    sys.setrecursionlimit(rec_limit)
    perm = np.concatenate(order) if order else np.arange(0)
    bmin_h = np.stack(nb_min)
    bmax_h = np.stack(nb_max)
    off_h = np.asarray(noffset, np.int32)
    npr_h = np.asarray(nprims, np.int32)
    ax_h = np.asarray(naxis, np.int32)
    return BVHArrays(
        bounds_min=jnp.asarray(bmin_h),
        bounds_max=jnp.asarray(bmax_h),
        offset=jnp.asarray(off_h),
        n_prims=jnp.asarray(npr_h),
        axis=jnp.asarray(ax_h),
        order=perm,
        max_leaf=max_prims,
        nodes=_pack_nodes(bmin_h, bmax_h, off_h, npr_h, ax_h),
    )


def offset_leaf_tris(bvh: BVHArrays, base: int) -> BVHArrays:
    """Shift LEAF triangle offsets by ``base`` (interior child offsets
    untouched). Used when a subset tree's triangles live at a nonzero
    position in the combined reordered scene arrays (alpha-split)."""
    off = np.asarray(bvh.offset)
    npr = np.asarray(bvh.n_prims)
    off2 = np.where(npr > 0, off + base, off).astype(np.int32)
    nodes = np.asarray(bvh.nodes).copy()
    nodes[:, 6] = off2.astype(np.float32)
    return BVHArrays(
        bounds_min=bvh.bounds_min, bounds_max=bvh.bounds_max,
        offset=jnp.asarray(off2), n_prims=bvh.n_prims, axis=bvh.axis,
        order=bvh.order, max_leaf=bvh.max_leaf, nodes=jnp.asarray(nodes))


def _slab_test(bmin, bmax, o, inv_d, t_best):
    """Robust AABB slab test with gamma(3) widening
    (ref bounds.rs:198-232 intersect_p_precomp)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    # 0*inf -> NaN when the origin sits exactly on a slab plane of an axis
    # with zero direction; that axis is then non-constraining (the origin
    # is on the slab boundary, i.e. inside) — pbrt lets the NaN comparisons
    # pass, jnp.min/max would instead propagate it and cull the node.
    nan_ax = jnp.isnan(t0) | jnp.isnan(t1)
    t_near = jnp.where(nan_ax, -jnp.inf, jnp.minimum(t0, t1))
    t_far = jnp.where(nan_ax, jnp.inf,
                      jnp.maximum(t0, t1) * (1.0 + 2.0 * pm.gamma(3)))
    tn = jnp.max(t_near, axis=-1)
    tf = jnp.min(t_far, axis=-1)
    return (tn <= tf) & (tf > 0.0) & (tn < t_best)


def _alpha_test_inline(alpha_pack, alpha_texels, pid, b):
    """Level-0 bilinear alpha-mask test per leaf candidate.

    Mirrors shape.rs:228-244 (closest hit) / :471-521 (shadow): a hit on a
    masked triangle whose interpolated alpha is exactly 0 is discarded
    DURING traversal, so one traversal replaces the integrator's re-spawn
    retries. Returns True where the candidate SURVIVES.
    """
    from ..scene.scene import (AP_BASE, AP_FLAG, AP_H, AP_OUOV, AP_SUSV,
                               AP_UV0, AP_UV1, AP_UV2, AP_W, AP_WRAP)
    from ..scene.texture import WRAP_CLAMP, WRAP_REPEAT
    arow = alpha_pack[pid]
    flag = arow[:, AP_FLAG] > 0.5
    b0, b1, b2 = b[..., 0:1], b[..., 1:2], b[..., 2:3]
    uv = b0 * arow[:, AP_UV0] + b1 * arow[:, AP_UV1] + b2 * arow[:, AP_UV2]
    st = uv * arow[:, AP_SUSV] + arow[:, AP_OUOV]
    w = arow[:, AP_W]
    h = arow[:, AP_H]
    wrap = arow[:, AP_WRAP].astype(jnp.int32)
    base = jax.lax.bitcast_convert_type(arow[:, AP_BASE], jnp.int32)
    s = st[..., 0] * w - 0.5
    t = st[..., 1] * h - 0.5
    s0f = jnp.floor(s)
    t0f = jnp.floor(t)
    ds = s - s0f
    dt = t - t0f
    s0 = s0f.astype(jnp.int32)
    t0 = t0f.astype(jnp.int32)
    wi = w.astype(jnp.int32)
    hi = h.astype(jnp.int32)

    def texel(si, ti):
        s_w = jnp.select([wrap == WRAP_REPEAT, wrap == WRAP_CLAMP],
                         [jnp.mod(si, wi), jnp.clip(si, 0, wi - 1)],
                         jnp.clip(si, 0, wi - 1))
        t_w = jnp.select([wrap == WRAP_REPEAT, wrap == WRAP_CLAMP],
                         [jnp.mod(ti, hi), jnp.clip(ti, 0, hi - 1)],
                         jnp.clip(ti, 0, hi - 1))
        outside = (si < 0) | (si >= wi) | (ti < 0) | (ti >= hi)
        v = alpha_texels[base + t_w * wi + s_w]
        black = (wrap != WRAP_REPEAT) & (wrap != WRAP_CLAMP) & outside
        return jnp.where(black, 0.0, v)

    a = (texel(s0, t0) * (1 - ds) * (1 - dt)
         + texel(s0, t0 + 1) * (1 - ds) * dt
         + texel(s0 + 1, t0) * ds * (1 - dt)
         + texel(s0 + 1, t0 + 1) * ds * dt)
    return ~(flag & (a == 0.0))


def bvh_intersect_chunked(bvh: BVHArrays, tri_pack, o, d, t_max,
                          chunks: int = 4, **kw):
    """Split the wave into ``chunks`` INDEPENDENT traversal loops.

    The TPU runtime overlaps independent while_loop subgraphs (measured:
    a second identical traversal adds ~20% wall time, four add ~140%),
    and per-loop cost is linear in lane count — so k sub-loops of N/k
    lanes cost ~1/k each and overlap, recovering most of the latency the
    single monolithic loop serializes. Falls back to one loop for small
    waves.
    """
    n = o.shape[0]
    if chunks <= 1 or n < 4096 * chunks or n % chunks != 0:
        return bvh_intersect(bvh, tri_pack, o, d, t_max, **kw)
    c = n // chunks
    outs = [bvh_intersect(bvh, tri_pack, o[i * c:(i + 1) * c],
                          d[i * c:(i + 1) * c], t_max[i * c:(i + 1) * c],
                          **kw)
            for i in range(chunks)]
    if kw.get("any_hit"):
        return jnp.concatenate(outs)
    return {k: jnp.concatenate([h[k] for h in outs]) for k in outs[0]}


def bvh_intersect(bvh: BVHArrays, tri_pack, o, d, t_max,
                  any_hit: bool = False, alpha_pack=None, alpha_texels=None):
    """Lane-parallel BVH traversal (device).

    tri_pack: (F, 12) packed [p0 p1 p2 pad] rows (ops/pallas pack_triangles)
    already in BVH order — one row gather per leaf-triangle test instead
    of three. alpha_pack/alpha_texels (scene.pack_alpha_tri) enable the
    inline alpha-mask test. Returns the same hit record as intersect_brute;
    for any_hit=True, returns (N,) bool occlusion.
    """
    n = o.shape[0]
    f32 = jnp.float32
    # pack tables may arrive as host numpy (scene build is host-side;
    # direct test callers skip TracedScene.create's one device push)
    tri_pack = jnp.asarray(tri_pack)
    if alpha_pack is not None:
        alpha_pack = jnp.asarray(alpha_pack)
    if alpha_texels is not None:
        alpha_texels = jnp.asarray(alpha_texels)
    inv_d = 1.0 / d
    neg = d < 0.0
    rows = jnp.arange(n)

    state = dict(
        stack=jnp.zeros((n, STACK_DEPTH), jnp.int32),
        sp=jnp.ones((n,), jnp.int32),  # root sits at slot 0
        t_best=t_max,
        tri=jnp.zeros((n,), jnp.int32),
        b=jnp.zeros((n, 3), f32),
        found=jnp.zeros((n,), bool),
    )

    def live_mask(st):
        live = st["sp"] > 0
        if any_hit:
            live = live & ~st["found"]
        return live

    def cond(st):
        return jnp.any(live_mask(st))

    def body(st):
        live = live_mask(st)
        sp = jnp.where(live, st["sp"] - 1, st["sp"])
        node = st["stack"][rows, jnp.minimum(sp, STACK_DEPTH - 1)]
        node = jnp.where(live, node, 0)

        nrow = bvh.nodes[node]  # ONE packed row gather per pop
        near = _slab_test(nrow[:, 0:3], nrow[:, 3:6],
                          o, inv_d, st["t_best"]) & live

        off = nrow[:, 6].astype(jnp.int32)
        meta = nrow[:, 7].astype(jnp.int32)
        n_p = meta >> 2
        axis = meta & 3
        is_leaf = n_p > 0

        # --- leaf: watertight test on up to max_leaf triangles
        t_best, tri, b, found = st["t_best"], st["tri"], st["b"], st["found"]
        leaf_hit = near & is_leaf
        for k in range(bvh.max_leaf):
            in_leaf = leaf_hit & (k < n_p)
            pid = jnp.where(in_leaf, off + k, 0)
            trow = tri_pack[pid]  # one packed row gather per candidate
            t_k, b_k, hit_k = watertight_hit_diag(
                o, d, t_best, trow[:, 0:3], trow[:, 3:6], trow[:, 6:9])
            take = in_leaf & hit_k
            if alpha_pack is not None:
                take = take & _alpha_test_inline(alpha_pack, alpha_texels,
                                                 pid, b_k)
            t_best = jnp.where(take, t_k, t_best)
            tri = jnp.where(take, pid, tri)
            b = jnp.where(take[:, None], b_k, b)
            found = found | take

        # --- interior: push far child first so the near child pops first
        push = near & ~is_leaf
        dir_neg = _take3(neg, axis)
        child_near = jnp.where(dir_neg, off, node + 1)
        child_far = jnp.where(dir_neg, node + 1, off)
        stack = st["stack"]
        slot = jnp.minimum(sp, STACK_DEPTH - 1)
        stack = stack.at[rows, slot].set(
            jnp.where(push, child_far, stack[rows, slot]))
        sp = jnp.where(push, sp + 1, sp)
        slot = jnp.minimum(sp, STACK_DEPTH - 1)
        stack = stack.at[rows, slot].set(
            jnp.where(push, child_near, stack[rows, slot]))
        sp = jnp.where(push, sp + 1, sp)

        return dict(stack=stack, sp=sp, t_best=t_best, tri=tri, b=b,
                    found=found)

    final = jax.lax.while_loop(cond, body, state)
    if any_hit:
        return final["found"]
    valid = final["found"]
    return dict(valid=valid, t=jnp.where(valid, final["t_best"], 0.0),
                tri=final["tri"], b=final["b"])
