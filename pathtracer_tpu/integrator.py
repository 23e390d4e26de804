"""Wavefront path integrator: NEE + MIS + Russian roulette, fully batched.

TPU-native rebuild of the reference's recursive per-pixel megakernel
(``src/pathtracer/integrator.rs``): the bounce recursion (li :392-503)
becomes a ``lax.while_loop`` over SoA wavefront state {ray, beta, L, alive
mask}; ``estimate_direct`` (:23-139, both-strategy MIS) and
``uniform_sample_one_light`` (:192-217) are evaluated for every live ray at
once. The rayon tile fan-out (:617-637) becomes (a) on-chip vectorization
over row-band waves and (b) cross-chip data parallelism (parallel/mesh.py).
Per-iteration cost mirrors the reference hot path (SURVEY §3.2): one
closest-hit + one shadow any-hit + one MIS closest-hit.

Sampling: Sobol' with per-pixel cantor scrambles (ops/sobol.py). DEVIATION
from the reference's adaptive per-path dimension counters
(sampler/sobol.rs:129-151): each bounce owns a static 8-dimension slot
(u_light, u_scatter, light-pick, bsdf, rr) so the whole wave shares one
dimension per draw — this keeps Sobol evaluation dense (no per-ray row
gathers) and is still a valid low-discrepancy sequence; unused slots (e.g.
NEE dims at specular hits) are simply skipped.

Film: row-band tiles splat densely (core/film.splat_tile) into a padded
accumulator — no scatter ops anywhere in the hot path.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .core import math as pm
from .core.camera import Camera, generate_rays, generate_rays_diff
from .core.film import (FILM_PAD, film_crop, film_pad_accumulate,
                        film_pad_new, sample_bounds, splat_halfwidth,
                        splat_tile)
from .core.filter import filter_f1d as make_filter_f1d, make_filter
from .ops import bsdf as bx
from .ops import interaction as ia
from .ops import lights as lt
from .ops import sobol as sb
from .ops.intersect import intersect_brute, intersect_p_brute

# static per-bounce dimension layout (after camera dims 0,1)
DIMS_PER_BOUNCE = 8
DIM_U_LIGHT = 0
DIM_U_SCATTER = 2
DIM_LIGHT_PICK = 4
DIM_BSDF = 5
DIM_RR = 7


def _bounce_stride(cfg, n_lights: int) -> int:
    """Sobol dims consumed per bounce. light_strategy="all" appends 4
    dims (u_light, u_scatter) per light after the base slots."""
    if cfg.light_strategy == "all":
        assert n_lights <= 24, "all-lights strategy capped at 24 lights"
        return DIMS_PER_BOUNCE + 4 * n_lights
    return DIMS_PER_BOUNCE


@dataclasses.dataclass(frozen=True)
class PathConfig:
    """Integrator knobs (ref integrator.rs:219-246)."""

    max_depth: int = 15
    rr_threshold: float = 1.0
    rr_start_depth: int = 3
    rr_enable: bool = True
    sanitize: bool = True  # zero non-finite radiance instead of logging
    sampler: str = "sobol"  # "sobol" | "stratified" | "random"
    # NEE strategy: "one" = uniform_sample_one_light (integrator.rs:192-217,
    # the li() default), "all" = uniform_sample_all_lights (:141-189, one
    # sample per light; the reference's per-light sample arrays become
    # per-light static Sobol dimension slots)
    light_strategy: str = "one"
    # per-bounce live-lane counters (PathIntegrator.bounce_occupancy; the
    # CLI --profile flag enables them). Off by default: threading the
    # (max_depth+1,) vector through the spp fori_loop carry costs ~25%
    # on the cornell bench (it breaks XLA's cross-bounce fusion).
    count_occupancy: bool = False
    # MIS estimator: "ref" = faithful to the reference (estimate_direct's
    # BSDF branch re-intersects the scene, integrator.rs:82-136; Le only
    # on camera/specular bounces, :418-427). "onesample" = pbrt-v4
    # PathIntegrator form: the continuation ray doubles as the MIS BSDF
    # branch (Le at EVERY vertex, weighted by the previous vertex's
    # light-sampling density) — one closest-hit traversal fewer per
    # bounce, same expectation. The DEFAULT is the reference-faithful
    # estimator; bench/production configs opt into "onesample".
    mis_mode: str = "ref"


def _scene_intersect_raw(scene, o, d, t_max, count_steps=False):
    if scene.bvh is not None:
        # Alpha masks are tested INLINE (exact, no retry cap) —
        # shape.rs:228-244 semantics. Masked triangles (typically ~1% of a
        # scene, foliage-style overlapping quads that defeat BVH pruning)
        # are SPLIT OUT of the main tree and intersected DENSELY: the
        # (N x A) watertight pass broadcasts the triangles over the VPU
        # with zero per-lane gathers (measured ~20x over a dedicated
        # alpha BVH on the Sponza ivy). Order: MAIN tree first — most
        # rays hit opaque geometry, and that t makes lanes far from
        # foliage skip the alpha tree (and its cut-retry re-traversals)
        # entirely; the reverse order gave the main tree a useless inf
        # entry bound for the ~95% of lanes that miss foliage.
        if not scene.split_alpha:
            return _main_closest(scene, o, d, t_max,
                                 count_steps=count_steps)
        hit = _main_closest(scene, o, d, t_max, count_steps=count_steps)
        t2 = jnp.where(hit["valid"], hit["t"], t_max)
        hit_a = _alpha_set_intersect(scene, o, d, t2)
        # hit_a.valid implies t2-pruned, i.e. closer than the main hit
        c = ~hit_a["valid"]
        out = dict(valid=hit["valid"] | hit_a["valid"],
                   t=jnp.where(c, hit["t"], hit_a["t"]),
                   tri=jnp.where(c, hit["tri"], hit_a["tri"]),
                   b=jnp.where(c[:, None], hit["b"], hit_a["b"]))
        if "steps" in hit:
            out["steps"] = hit["steps"]  # main-tree cost only (dense
            # alpha cost is lane-uniform, useless as a sort key)
        return out
    if scene.use_pallas:
        from .ops.pallas.intersect_pl import intersect_pallas
        return intersect_pallas(o, d, t_max, scene.tri_pack)
    return intersect_brute(o, d, t_max, scene.data.p0, scene.data.p1,
                           scene.data.p2)


def _main_closest(scene, o, d, t_max, count_steps=False):
    """Closest hit against the main tree: 32-wide row traversal
    (accel/bvhw, one 256-float gather per step + register stack) when
    available, else the classic flattened-node path (with inline alpha
    when unsplit). count_steps (bvhw path only) adds per-lane traversal
    iteration counts to the hit dict — the cost key the wavefront sort
    uses next bounce."""
    if scene.bw_rows is not None:
        from .accel.bvhw import bvhw_intersect_chunked
        return bvhw_intersect_chunked(scene.bw_rows, o, d, t_max,
                                      count_steps=count_steps,
                                      **_traversal_knobs(scene))
    from .accel.bvh import bvh_intersect
    return bvh_intersect(scene.bvh, scene.tri_pack, o, d, t_max,
                         alpha_pack=None if scene.split_alpha
                         else scene.alpha_pack,
                         alpha_texels=None if scene.split_alpha
                         else scene.alpha_texels)


def _traversal_knobs(scene):
    """Hardware-tuned BVH32 launch geometry (tuned.json / PTPU_* env).

    Interleaving doubles the loop body (2 x 25 inline leaf tests), which
    exploded XLA compile time when unrolled across bounces in the FUSED
    whole-wave program — so it only ever applies to trees big enough to
    take the SEGMENTED per-bounce path (compile cost there is per bounce,
    not x(depth+1))."""
    from . import tuning
    chunks = tuning.get("traversal_chunks", 4)
    il = tuning.get("traversal_interleave", 1)
    if scene.bw_rows.shape[0] < _SEG_MIN_ROWS:
        il = 1
    return dict(chunks=chunks, interleave=il, stackw=scene.bw_depth,
                leaf_mode=tuning.get_str("bvhw_leaf_mode", "batched"))


def _main_anyhit(scene, o, d, t_max):
    if scene.bw_rows is not None:
        from .accel.bvhw import bvhw_intersect_chunked
        return bvhw_intersect_chunked(scene.bw_rows, o, d, t_max,
                                      any_hit=True,
                                      **_traversal_knobs(scene))
    from .accel.bvh import bvh_intersect
    return bvh_intersect(scene.bvh, scene.tri_pack, o, d, t_max,
                         any_hit=True,
                         alpha_pack=None if scene.split_alpha
                         else scene.alpha_pack,
                         alpha_texels=None if scene.split_alpha
                         else scene.alpha_texels)


def _alpha_tree_isect(scene, o, d, t_max):
    """One closest-hit pass over the alpha-subset 32-wide tree: chunked
    (chunks whose lanes are ALL dead — e.g. in retry passes where only
    cut lanes stay live — exit their while_loop on the first cond check)
    with a stack sized to the small tree's actual depth."""
    from .accel.bvhw import bvhw_intersect_chunked
    from . import tuning
    return bvhw_intersect_chunked(
        scene.bwa_rows, o, d, t_max,
        chunks=tuning.get("traversal_chunks", 4),
        stackw=scene.bwa_depth,
        leaf_mode=tuning.get_str("bvhw_leaf_mode", "batched"))


def _alpha_tree_closest(scene, o, d, t_max):
    """Closest UN-CUT hit in the alpha subset: small 32-wide tree treating
    masked tris as opaque + bounded re-spawn retries for hits that land on
    zero-alpha texels (the reference walks masked layers inline,
    shape.rs:228-244; foliage cut rate makes retries rare). Returned t is
    the ACCUMULATED distance from the original origin (re-spawn offsets
    make it approximate at ~1e-4 relative — used only to prune the main
    traversal; shading recomputes p from barycentrics)."""
    def isect(o_, t_):
        h = _alpha_tree_isect(scene, o_, d, t_)
        h["tri"] = jnp.where(
            h["valid"],
            scene.bwa_map[jnp.maximum(h["tri"], 0)], 0)
        return h

    hit = isect(o, t_max)
    cut, p_hit, p_err, ng = _alpha_cut(scene, hit)
    t_base = jnp.zeros_like(t_max)

    def cond(st):
        return (st[0] < ALPHA_RETRIES) & jnp.any(st[5])

    def body(st):
        k, o_c, t_rem, t_base, hit, cut, p_hit, p_err, ng = st
        o_c = jnp.where(cut[..., None], ia.spawn_ray(p_hit, p_err, ng, d),
                        o_c)
        t_base = jnp.where(cut, t_base + hit["t"], t_base)
        t_rem = jnp.where(cut, jnp.maximum(t_rem - hit["t"], 0.0), t_rem)
        # non-cut lanes enter dead (t=0): the retry traversal only
        # re-walks lanes that actually hit a zero-alpha texel
        hit2 = isect(o_c, jnp.where(cut, t_rem, 0.0))
        hit = {key: jnp.where(
            cut.reshape(cut.shape + (1,) * (hit[key].ndim - 1)),
            hit2[key], hit[key]) for key in hit}
        cut, p_hit, p_err, ng = _alpha_cut(scene, hit)
        return k + 1, o_c, t_rem, t_base, hit, cut, p_hit, p_err, ng

    st = jax.lax.while_loop(cond, body, (jnp.int32(0), o, t_max, t_base,
                                         hit, cut, p_hit, p_err, ng))
    t_base, hit, cut = st[3], dict(st[4]), st[5]
    hit["valid"] = hit["valid"] & ~cut
    hit["t"] = jnp.where(hit["valid"], t_base + hit["t"], 0.0)
    return hit


def _alpha_tree_anyhit(scene, o, d, t_max):
    """Occlusion against the alpha subset via the 32-wide tree: closest
    hits walked past cut layers (same structure as _scene_intersect_p's
    retry loop)."""

    def isect(o_, t_):
        h = _alpha_tree_isect(scene, o_, d, t_)
        h["tri"] = jnp.where(
            h["valid"], scene.bwa_map[jnp.maximum(h["tri"], 0)], 0)
        return h

    hit = isect(o, t_max)
    cut, p_hit, p_err, ng = _alpha_cut(scene, hit)
    occluded = hit["valid"] & ~cut
    searching = cut

    def cond(st):
        return (st[0] < ALPHA_RETRIES) & jnp.any(st[2])

    def body(st):
        k, occluded, searching, o_c, t_rem, t_hit, p_hit, p_err, ng = st
        o_c = jnp.where(searching[..., None],
                        ia.spawn_ray(p_hit, p_err, ng, d), o_c)
        t_rem = jnp.where(searching, jnp.maximum(t_rem - t_hit, 0.0), t_rem)
        hit = isect(o_c, jnp.where(searching, t_rem, 0.0))
        cut, p_hit, p_err, ng = _alpha_cut(scene, hit)
        occluded = occluded | (searching & hit["valid"] & ~cut)
        searching = searching & cut
        return (k + 1, occluded, searching, o_c, t_rem, hit["t"], p_hit,
                p_err, ng)

    st = jax.lax.while_loop(
        cond, body, (jnp.int32(0), occluded, searching, o, t_max, hit["t"],
                     p_hit, p_err, ng))
    # retries exhausted: remaining cut layers read as opaque (bounded
    # deviation, same as the non-BVH path)
    return st[1] | st[2]


def _alpha_set_intersect(scene, o, d, t_max, any_hit=False):
    """Closest (or any) hit against the split-out alpha-masked subset:
    32-wide tree + retries when large (bwa), dense when small
    (intersect_alpha_dense), or the dedicated binary tree."""
    from .accel.bvh import _alpha_test_inline, bvh_intersect
    if scene.bwa_rows is not None:
        if any_hit:
            return _alpha_tree_anyhit(scene, o, d, t_max)
        return _alpha_tree_closest(scene, o, d, t_max)
    if scene.bvh_alpha is not None:
        return bvh_intersect(scene.bvh_alpha, scene.tri_pack, o, d, t_max,
                             any_hit=any_hit, alpha_pack=scene.alpha_pack,
                             alpha_texels=scene.alpha_texels)
    from .ops.intersect import intersect_alpha_dense
    n_op = scene.n_opaque
    sd = scene.data
    return intersect_alpha_dense(
        o, d, t_max, sd.p0[n_op:], sd.p1[n_op:], sd.p2[n_op:], n_op,
        lambda pid, b: _alpha_test_inline(scene.alpha_pack,
                                          scene.alpha_texels, pid, b),
        any_hit=any_hit)


# Bounded re-spawn iterations for alpha cutouts. The reference's recursive
# traversal rejects masked hits inline and keeps walking (shape.rs:228-244);
# the wavefront analogue re-spawns cut lanes past the surface and
# re-intersects the wave. 3 retries = up to 3 stacked cutout layers per ray;
# deeper stacks degrade to treating the 4th layer as opaque.
ALPHA_RETRIES = 3


def _alpha_cut(scene, hit):
    """Lanes whose valid hit lands on a zero-alpha texel of a masked tri.

    Returns (cut (N,) bool, p_hit, p_error, ng) for re-spawning.
    Alpha test semantics mirror shape.rs:228-244: evaluate the mask at the
    interpolated uv, discard iff exactly 0.
    """
    from .ops.gather import take_rows
    from .scene.scene import (TA_ALPHA, TA_NG0, TA_P0, TA_P1, TA_P2,
                              TA_UV0, TA_UV1, TA_UV2)
    from .ops.intersect import GAMMA7
    rows = take_rows(scene.tri_attr, hit["tri"])
    txd = rows[:, TA_ALPHA].astype(jnp.int32)
    b = hit["b"]
    b0, b1, b2 = b[..., 0:1], b[..., 1:2], b[..., 2:3]
    uv_hit = b0 * rows[:, TA_UV0] + b1 * rows[:, TA_UV1] + b2 * rows[:, TA_UV2]
    alpha = bx.eval_texture(scene.data, txd, uv_hit,
                            jnp.ones(uv_hit.shape[:-1] + (3,)))[..., 0]
    cut = hit["valid"] & (txd >= 0) & (alpha == 0.0)
    p0, p1, p2 = rows[:, TA_P0], rows[:, TA_P1], rows[:, TA_P2]
    p_hit = b0 * p0 + b1 * p1 + b2 * p2
    p_err = GAMMA7 * (jnp.abs(b0 * p0) + jnp.abs(b1 * p1) + jnp.abs(b2 * p2))
    return cut, p_hit, p_err, rows[:, TA_NG0]


def _scene_intersect(scene, o, d, t_max, count_steps=False):
    hit = _scene_intersect_raw(scene, o, d, t_max,
                               count_steps=count_steps)
    if not scene.has_alpha or scene.bvh is not None:
        return hit  # BVH scenes test alpha inline during traversal
    # early-exit retry loop: most waves have no cut lanes after the first
    # pass (and secondary/shadow waves often none at all), so the retry
    # traversal body — compiled ONCE, not unrolled — usually never runs
    cut0, p_hit0, p_err0, ng0 = _alpha_cut(scene, hit)

    def cond(st):
        return (st[0] < ALPHA_RETRIES) & jnp.any(st[4])

    def body(st):
        k, o, t_max, hit, cut, p_hit, p_err, ng = st
        o = jnp.where(cut[..., None], ia.spawn_ray(p_hit, p_err, ng, d), o)
        t_max = jnp.where(cut, jnp.maximum(t_max - hit["t"], 0.0), t_max)
        hit2 = _scene_intersect_raw(scene, o, d,
                                    jnp.where(cut, t_max, 0.0))
        hit = {key: jnp.where(
            cut.reshape(cut.shape + (1,) * (hit[key].ndim - 1)),
            hit2[key], hit[key]) for key in hit}
        cut, p_hit, p_err, ng = _alpha_cut(scene, hit)
        return k + 1, o, t_max, hit, cut, p_hit, p_err, ng

    st = jax.lax.while_loop(
        cond, body, (jnp.int32(0), o, t_max, hit, cut0, p_hit0, p_err0, ng0))
    hit, cut = dict(st[3]), st[4]
    # retries exhausted: drop still-cut hits (NOTE: hit t for re-spawned
    # lanes is measured from the last re-spawn origin; no consumer uses it)
    hit["valid"] = hit["valid"] & ~cut
    return hit


def _scene_intersect_p(scene, o, d, t_max):
    if not scene.has_alpha or scene.bvh is not None:
        if scene.bvh is not None:
            occ = _main_anyhit(scene, o, d, t_max)
            if scene.split_alpha:
                # lanes already occluded skip the alpha pass (t_max = 0)
                t2 = jnp.where(occ, 0.0, t_max)
                occ = occ | _alpha_set_intersect(scene, o, d, t2,
                                                 any_hit=True)
            return occ
        if scene.use_pallas:
            from .ops.pallas.intersect_pl import intersect_pallas
            return intersect_pallas(o, d, t_max, scene.tri_pack,
                                    any_hit=True)
        return intersect_p_brute(o, d, t_max, scene.data.p0, scene.data.p1,
                                 scene.data.p2)
    # alpha scenes: shadow rays need the hit uv to test the mask
    # (shape.rs:471-521), so walk closest hits past cut surfaces. Same
    # early-exit while_loop structure as _scene_intersect.
    hit = _scene_intersect_raw(scene, o, d, t_max)
    cut, p_hit, p_err, ng = _alpha_cut(scene, hit)
    occluded = hit["valid"] & ~cut
    searching = cut

    def cond(st):
        return (st[0] < ALPHA_RETRIES) & jnp.any(st[2])

    def body(st):
        k, occluded, searching, o, t_max, t_hit, p_hit, p_err, ng = st
        o = jnp.where(searching[..., None],
                      ia.spawn_ray(p_hit, p_err, ng, d), o)
        t_max = jnp.where(searching, jnp.maximum(t_max - t_hit, 0.0), t_max)
        hit = _scene_intersect_raw(scene, o, d,
                                   jnp.where(searching, t_max, 0.0))
        cut, p_hit, p_err, ng = _alpha_cut(scene, hit)
        occluded = occluded | (searching & hit["valid"] & ~cut)
        searching = searching & cut
        return (k + 1, occluded, searching, o, t_max, hit["t"], p_hit,
                p_err, ng)

    st = jax.lax.while_loop(
        cond, body, (jnp.int32(0), occluded, searching, o, t_max, hit["t"],
                     p_hit, p_err, ng))
    # retries exhausted: treat the remaining cut layer as opaque
    return st[1] | st[2]


@dataclasses.dataclass(frozen=True)
class TracedScene:
    """SceneData plus an optional BVH and packed gather tables.

    use_pallas routes brute-force intersection through the Pallas kernel
    (TPU backends only; the XLA fallback serves CPU tests). tri_attr /
    light_attr / mat_attr are the packed per-row attribute matrices the hot
    path gathers from (scene/scene.py pack_*; ops/gather.py take_rows).
    """

    data: "SceneData"  # noqa: F821
    bvh: "BVHArrays | None" = None  # noqa: F821
    use_pallas: bool = False
    # static set of material types present — absent BSDF models compile out
    mat_set: tuple = (0, 1, 2, 3, 4, 5)
    has_normal_maps: bool = False
    tri_attr: Any = None  # (F, TA_WIDTH)
    light_attr: Any = None  # (L, LA_WIDTH)
    mat_attr: Any = None  # (M, MA_WIDTH)
    tri_pack: Any = None  # (F, 12) [p0 p1 p2 pad] rows for intersection
    # static: any used material binds a texture (kd/ks/metallic/rough)
    has_tex: bool = True
    # static per-channel texture presence (kd, ks, metallic, rough):
    # channels nothing binds compile out of gather_params entirely —
    # each saved eval_texture is 4-8 texel gathers/lane/bounce
    tex_channels: tuple = (True, True, True, True)
    # static: environment light present / number of lights / light types
    # present (compile-time specialization: env lookups, NEE and absent
    # light-type branches compile out)
    has_env: bool = True
    n_lights: int = 1
    light_set: tuple = (0, 1, 2, 3)
    # static: any triangle carries an alpha cutout mask (shape.rs:228-244)
    has_alpha: bool = False
    # inline-alpha tables for BVH traversal (scene.pack_alpha_tri)
    alpha_pack: Any = None   # (F, 16)
    alpha_texels: Any = None  # (total,) level-0 pool column 0
    # alpha-masked triangles are SPLIT OUT of the main tree (they sit
    # last in the reordered arrays, [n_opaque:F)): intersected densely
    # when few, else via a dedicated tree (bvh_alpha)
    split_alpha: bool = False
    n_opaque: int = -1  # static: first alpha tri index when split
    bvh_alpha: "BVHArrays | None" = None  # noqa: F821
    # 32-wide main-tree layout (accel/bvhw): 256-float rows, 25-tri
    # merged leaves, register short stack. ~7k rows for a 123.6k-tri
    # scene keeps the table inside the fast-gather regime (<12k rows and
    # <12 MB, tools/probe_gather_width3.py) — preferred traversal
    bw_rows: Any = None  # (R, 256)
    # 32-wide tree over the split-out alpha subset (masked tris treated
    # opaque; cut hits re-spawn) + local->global tri id map. Replaces the
    # dense (N x A) pass when the subset is big enough that broadcasting
    # loses to ~tree-depth row gathers (measured 89 ms vs ~3 ms at
    # A=1320, 65k lanes)
    bwa_rows: Any = None  # (Ra, 256)
    bwa_map: Any = None   # (A,) i32
    # static interior depths of the 32-wide trees: traversal sizes its
    # while_loop stack exactly (pushes <= depth-1), instead of carrying
    # the 10-row worst case (accel/bvhw._traverse_setup)
    bw_depth: int = 10
    bwa_depth: int = 10

    @staticmethod
    def create(scene_data, use_bvh: bool | None = None,
               max_leaf: int = 4,
               use_pallas: bool | None = None) -> "TracedScene":
        import numpy as _np
        from .scene.scene import (pack_alpha_tri, pack_light_attr,
                                  pack_mat_attr, pack_tri_attr,
                                  reorder_triangles)
        f = int(scene_data.p0.shape[0])
        used_mats = _np.unique(_np.asarray(scene_data.material_id))
        mat_set = tuple(sorted(set(
            _np.asarray(scene_data.mat_type)[used_mats].tolist())))
        has_nm = bool(
            (_np.asarray(scene_data.mat_normal_tx)[used_mats] >= 0).any())
        tex_channels = tuple(
            bool((_np.asarray(tx)[used_mats] >= 0).any())
            for tx in (scene_data.mat_kd_tx, scene_data.mat_ks_tx,
                       scene_data.mat_metallic_tx, scene_data.mat_rough_tx))
        has_tex = any(tex_channels)
        if use_bvh is None:
            # pallas brute force (fully unrolled kernel) for tiny scenes;
            # dynamic-indexed triangle loops fault Mosaic (known issue), so
            # anything bigger goes through the BVH traversal
            use_bvh = f > 128
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        bvh = bvh_alpha = None
        split_alpha = False
        n_opaque = -1
        if use_bvh:
            from .accel.bvh import build_bvh, offset_leaf_tris
            p0 = _np.asarray(scene_data.p0)
            p1 = _np.asarray(scene_data.p1)
            p2 = _np.asarray(scene_data.p2)
            amask = _np.asarray(scene_data.tri_alpha_txd) >= 0
            n_alpha = int(amask.sum())
            main_leaf = max_leaf
            if 0 < n_alpha < f:
                # alpha-split: masked tris (typically ~1%, foliage-style
                # overlapping quads) leave the main tree. Small sets are
                # intersected DENSELY (no tree at all — BVH pruning fails
                # on overlapping cutouts); larger sets get their own tree.
                split_alpha = True
                op_idx = _np.nonzero(~amask)[0]
                al_idx = _np.nonzero(amask)[0]
                n_opaque = len(op_idx)
                bvh = build_bvh(p0[op_idx], p1[op_idx], p2[op_idx],
                                main_leaf)
                # dense path materializes an (N_wave x n_alpha) t-matrix;
                # bound it by BYTES at the max 131072-lane wave (~768 MB)
                # rather than triangle count alone, so the threshold corner
                # can't blow HBM (n_alpha=4096 x 131k lanes would be 2.1 GB)
                dense_cap = min(4096, (768 << 20) // ((1 << 17) * 4))
                if n_alpha <= dense_cap:
                    order = _np.concatenate([op_idx[bvh.order], al_idx])
                else:
                    bvh_alpha = build_bvh(p0[al_idx], p1[al_idx],
                                          p2[al_idx], max_leaf)
                    order = _np.concatenate([op_idx[bvh.order],
                                             al_idx[bvh_alpha.order]])
                    bvh_alpha = offset_leaf_tris(bvh_alpha, n_opaque)
                scene_data = reorder_triangles(scene_data, order)
            else:
                bvh = build_bvh(p0, p1, p2, main_leaf)
                scene_data = reorder_triangles(scene_data, bvh.order)
        from .ops.pallas.intersect_pl import pack_triangles
        # inline-alpha tables follow BVH triangle order (built post-reorder)
        a_pack, a_texels = (pack_alpha_tri(scene_data) if bvh is not None
                            else (None, None))
        bw_rows = None
        if bvh is not None and (n_alpha == 0 or split_alpha):
            # 32-wide collapse of the (alpha-free) main tree: one
            # 256-float row gather/step, 25-tri merged leaves, small table
            from .accel.bvhw import bvhw_from_binary
            p0r = _np.asarray(scene_data.p0)
            p1r = _np.asarray(scene_data.p1)
            p2r = _np.asarray(scene_data.p2)
            n_main = n_opaque if split_alpha else f
            tw, bw_depth = bvhw_from_binary(bvh, p0r[:n_main], p1r[:n_main],
                                            p2r[:n_main])
            bw_rows = tw  # host; pushed with the one tree_map sweep below
        else:
            bw_depth = 10
        bwa_rows = None
        bwa_map = None
        bwa_depth = 10
        if bw_rows is not None and split_alpha and n_alpha > 512:
            from .accel.bvhw import build_bvhw
            p0a = _np.asarray(scene_data.p0)[n_opaque:]
            p1a = _np.asarray(scene_data.p1)[n_opaque:]
            p2a = _np.asarray(scene_data.p2)[n_opaque:]
            twa, order_a, bwa_depth = build_bvhw(p0a, p1a, p2a)
            bwa_rows = twa
            bwa_map = _np.asarray(n_opaque + order_a, _np.int32)
        ts = TracedScene(
            scene_data, bvh, use_pallas, mat_set, has_nm,
            split_alpha=split_alpha, n_opaque=n_opaque, bvh_alpha=bvh_alpha,
            bw_rows=bw_rows, bwa_rows=bwa_rows, bwa_map=bwa_map,
            bw_depth=bw_depth, bwa_depth=bwa_depth,
            tri_pack=pack_triangles(scene_data.p0, scene_data.p1,
                                    scene_data.p2),
            alpha_pack=a_pack, alpha_texels=a_texels,
            tri_attr=pack_tri_attr(scene_data),
            light_attr=pack_light_attr(scene_data),
            mat_attr=pack_mat_attr(scene_data),
            has_tex=has_tex,
            tex_channels=tex_channels,
            has_env=bool(_np.asarray(scene_data.has_env)),
            n_lights=int(_np.asarray(scene_data.n_lights)),
            light_set=tuple(sorted(set(
                _np.asarray(scene_data.light_type).tolist())))
            if int(_np.asarray(scene_data.n_lights)) > 0 else (),
            has_alpha=bool(
                (_np.asarray(scene_data.tri_alpha_txd) >= 0).any()))
        # The whole build above is HOST numpy; push every array leaf to
        # the device in one sweep here. (Leaf-at-a-time jnp round-trips
        # during the build each cost an axon-tunnel roundtrip — measured
        # ~100 s of the 123.6k-tri create on TPU.)
        return jax.tree_util.tree_map(jnp.asarray, ts)


jax.tree_util.register_pytree_node(
    TracedScene,
    lambda s: ((s.data, s.bvh, s.tri_attr, s.light_attr, s.mat_attr,
                s.tri_pack, s.alpha_pack, s.alpha_texels, s.bvh_alpha,
                s.bw_rows, s.bwa_rows, s.bwa_map),
               (s.use_pallas, s.mat_set, s.has_normal_maps, s.has_tex,
                s.has_env, s.n_lights, s.light_set, s.has_alpha,
                s.split_alpha, s.n_opaque, s.tex_channels,
                s.bw_depth, s.bwa_depth)),
    lambda aux, kids: TracedScene(
        kids[0], kids[1], aux[0], aux[1], aux[2],
        tri_attr=kids[2], light_attr=kids[3], mat_attr=kids[4],
        tri_pack=kids[5], alpha_pack=kids[6], alpha_texels=kids[7],
        bvh_alpha=kids[8], bw_rows=kids[9],
        bwa_rows=kids[10], bwa_map=kids[11],
        has_tex=aux[3], has_env=aux[4], n_lights=aux[5], light_set=aux[6],
        has_alpha=aux[7], split_alpha=aux[8], n_opaque=aux[9],
        tex_channels=aux[10], bw_depth=aux[11], bwa_depth=aux[12]),
)


def _to_local(it, w):
    return jnp.stack([pm.dot(w, it["ss"]), pm.dot(w, it["ts"]),
                      pm.dot(w, it["ns"])], axis=-1)


def _to_world(it, w):
    return (w[..., 0:1] * it["ss"] + w[..., 1:2] * it["ts"]
            + w[..., 2:3] * it["ns"])


def estimate_direct(scene, cfg, it, mp, u_scatt, u_light, light_idx,
                    wo_world, bsdf_branch=True, pick_prob=1.0,
                    defer_shadow=False):
    """Both-strategy MIS direct lighting for one chosen light per ray.

    Ref integrator.rs:23-139. Returns (N, 3) radiance estimate (pre
    num_lights scaling). With ``bsdf_branch=False`` (the "onesample" MIS
    mode) only the light-sample branch runs — the BSDF strategy is
    covered by the MIS-weighted emission picked up when the CONTINUATION
    ray hits the light (pbrt-v4 PathIntegrator::SampleLd form) — and
    ``pick_prob`` (the light-selection pmf) folds into the effective
    light pdf instead of an outer num_lights scale.

    ``defer_shadow`` (onesample only): skip the occlusion test and
    return (contribution-if-unoccluded, (mask, so, sdir, st)) so the
    caller resolves the shadow ray inside the NEXT bounce's program.
    """
    from .ops.gather import take_rows
    sd = scene.data
    n = wo_world.shape[0]
    ld = jnp.zeros((n, 3), jnp.float32)

    light_rows = take_rows(scene.light_attr, light_idx)
    ls = lt.sample_li(sd, light_rows, it["p"], it["p_error"], it["ng"],
                      u_light, light_set=scene.light_set)
    wi = ls["wi"]
    pdf_eff = ls["pdf"] * pick_prob

    # --- light-sample branch (integrator.rs:44-80)
    wo_l = _to_local(it, wo_world)
    wi_l = _to_local(it, wi)
    reflect_ng = (pm.dot(wi, it["ng"]) * pm.dot(wo_world, it["ng"])) > 0.0
    f, scatt_pdf = bx.eval_f_pdf(mp, wo_l, wi_l, reflect_ng,
                                 present=scene.mat_set)
    f = f * jnp.abs(pm.dot(wi, it["ns"]))[..., None]

    branch1 = (ls["pdf"] > 0.0) & jnp.any(ls["li"] != 0.0, axis=-1) & \
        jnp.any(f != 0.0, axis=-1)
    so, sdir, st = ia.spawn_ray_to(it["p"], it["p_error"], it["ng"],
                                   ls["target_p"], ls["target_err"],
                                   ls["target_n"])
    w1 = jnp.where(ls["is_delta"], 1.0,
                   pm.power_heuristic(1.0, pdf_eff, 1.0, scatt_pdf))
    li1u = jnp.where(branch1[..., None], ls["li"], 0.0)
    contrib1 = f * li1u * w1[..., None] / \
        jnp.maximum(pdf_eff, 1e-20)[..., None]
    contrib1 = jnp.where(branch1[..., None], contrib1, 0.0)
    if defer_shadow:
        # segmented mode: the shadow any-hit is resolved at the START of
        # the NEXT bounce's program, where it overlaps that program's
        # closest-hit (independent while_loops overlap on this backend)
        assert not bsdf_branch
        return contrib1, (branch1, so, sdir, st)
    occluded = _scene_intersect_p(scene, so, sdir, st)
    ld = ld + jnp.where(occluded[..., None], 0.0, contrib1)
    if not bsdf_branch:
        return ld

    # --- BSDF-sample branch (integrator.rs:82-136), non-delta lights only
    bs = bx.sample_f(
        mp, wo_l, u_scatt,
        lambda wi_loc: (pm.dot(_to_world(it, wi_loc), it["ng"])
                        * pm.dot(wo_world, it["ng"])) > 0.0,
        present=scene.mat_set)
    wi2_w = _to_world(it, bs["wi"])
    f2 = bs["f"] * jnp.abs(pm.dot(wi2_w, it["ns"]))[..., None]
    branch2 = (~ls["is_delta"]) & jnp.any(f2 != 0.0, axis=-1) & (bs["pdf"] > 0.0)
    light_pdf2 = lt.pdf_li(sd, light_rows, it["p"], it["p_error"],
                           it["ng"], wi2_w, light_set=scene.light_set)
    w2 = pm.power_heuristic(1.0, bs["pdf"], 1.0, light_pdf2)
    branch2 = branch2 & (light_pdf2 > 0.0)

    o2 = ia.spawn_ray(it["p"], it["p_error"], it["ng"], wi2_w)
    hit2 = _scene_intersect(scene, o2, wi2_w,
                            jnp.full((n,), jnp.inf, jnp.float32))
    li2_hit, hit_tri_light = ia.hit_emission(scene.tri_attr, hit2, -wi2_w)
    hit_the_light = hit2["valid"] & (hit_tri_light == light_idx) & \
        (ls["is_area"])
    li2 = jnp.where(hit_the_light[..., None], li2_hit, 0.0)
    if scene.has_env:
        li2_env = jnp.where((ls["is_env"] & ~hit2["valid"])[..., None],
                            lt.env_le(sd, wi2_w), 0.0)
        li2 = jnp.where(hit_the_light[..., None], li2, li2_env)
    contrib2 = f2 * li2 * w2[..., None] / jnp.maximum(bs["pdf"], 1e-20)[..., None]
    ld = ld + jnp.where(branch2[..., None], contrib2, 0.0)
    return ld


def trace_wave(scene, cfg: PathConfig, draw, draw2, o, d,
               rxd=None, ryd=None, draw2_arr=None, lane_valid=None):
    """Trace one wavefront of rays to completion; returns (L (N,3), rays).

    draw(dim) / draw2(dim) produce one/two sampler dimensions for the whole
    wave (closures over the sampler state built in render_band). Dead lanes
    are masked (ref li(), :392-503).

    The bounce loop is STATICALLY UNROLLED (python loop, not
    lax.while_loop): every Sobol dimension becomes a compile-time constant
    (a traced dim forced one serialized dynamic-slice of the direction
    table per draw — ~7 ms/bounce on a 131k wave), RR compiles out below
    rr_start_depth, the final iteration keeps only the Le lookup, and XLA
    fuses across bounce boundaries. A full wave virtually always has some
    lane alive until max_depth, so the while_loop's early exit bought
    nothing.
    """
    st = _wave_init(scene, cfg, o, d, lane_valid=lane_valid)
    occupancy = []  # live-lane count per bounce (queue-occupancy counter)
    for bounce in range(cfg.max_depth + 1):
        st = _wave_bounce(scene, cfg, bounce, st, draw, draw2,
                          draw2_arr=draw2_arr,
                          rxd=rxd if bounce == 0 else None,
                          ryd=ryd if bounce == 0 else None)
        if cfg.count_occupancy:
            occupancy.append(st["n_live"])
    out, n_bad = _wave_radiance(cfg, st)
    occ = (jnp.stack(occupancy) if cfg.count_occupancy
           else jnp.zeros((cfg.max_depth + 1,), jnp.float32))
    return out, st["rays"], n_bad, occ


def _wave_flags(scene, cfg):
    """Static (compile-time) wave configuration derived from scene + cfg."""
    from .scene.scene import MAT_GLASS, MAT_MIRROR
    any_nonspec = any(m not in (MAT_MIRROR, MAT_GLASS)
                      for m in scene.mat_set)
    do_nee = any_nonspec and scene.n_lights > 0
    # "onesample" MIS (pbrt-v4 PathIntegrator): the BSDF strategy of the
    # direct-lighting MIS is realized by MIS-weighting the emission the
    # CONTINUATION ray hits, instead of a dedicated re-intersection —
    # one traversal fewer per bounce than the reference's estimate_direct
    # (integrator.rs:82-136). Falls back to "ref" when NEE is off.
    one_sample = cfg.mis_mode == "onesample" and do_nee
    pick_prob = (1.0 / max(scene.n_lights, 1)
                 if cfg.light_strategy == "one" else 1.0)
    # Wavefront compaction (static shapes preserved): the wide traversal
    # kills t_max<=0 lanes on ENTRY, so (a) RR-killed/escaped lanes stop
    # costing traversal iterations, and (b) for big trees lanes are
    # SORTED by last bounce's traversal step count (dead lanes last, a
    # strong predictor of this bounce's cost) so each sub-wave chunk's
    # while_loop trips to a similar bound instead of the global max.
    compact = scene.bw_rows is not None
    sort_waves = compact and scene.bw_rows.shape[0] >= _SORT_MIN_ROWS
    return do_nee, one_sample, pick_prob, compact, sort_waves


# trees below this row count skip the per-bounce cost sort (tiny trees
# traverse in a handful of iterations; sorting costs more than it saves)
_SORT_MIN_ROWS = 2048


def _wave_init(scene, cfg, o, d, lane_valid=None):
    """Fresh per-bounce wavefront state for a wave of camera rays.

    lane_valid (N,) bool marks real lanes: band-clip and compile-padding
    tail lanes start INACTIVE so they neither cost traversal iterations
    nor inflate the per-bounce n_live/rays counters that feed the
    Mrays/s metrics (they used to overcount by up to ~14% when seg_pad
    engaged)."""
    n = o.shape[0]
    f32 = jnp.float32
    _, one_sample, _, _, _ = _wave_flags(scene, cfg)
    active0 = (jnp.ones((n,), bool) if lane_valid is None
               else jnp.asarray(lane_valid).reshape(n))
    return dict(
        o=o, d=d,
        l=jnp.zeros((n, 3), f32),
        beta=jnp.ones((n, 3), f32),
        active=active0,
        # onesample: "specular" doubles as bounce-0 full-weight Le
        specular=jnp.full((n,), one_sample, bool),
        eta_scale=jnp.ones((n,), f32),
        prev_pdf=jnp.zeros((n,), f32),  # BSDF pdf of the ray's direction
        prev_p=o,
        prev_perr=jnp.zeros((n, 3), f32),
        prev_ng=jnp.zeros((n, 3), f32),
        prev_steps=jnp.zeros((n,), jnp.int32),
        rays=jnp.float32(0.0),
        n_live=jnp.float32(0.0),
        # deferred NEE shadow ray (segmented mode): resolved inside the
        # NEXT bounce's program where it overlaps that closest-hit
        pend_mask=jnp.zeros((n,), bool),
        pend_o=jnp.zeros((n, 3), f32),
        pend_d=jnp.zeros((n, 3), f32),
        pend_t=jnp.zeros((n,), f32),
        pend_contrib=jnp.zeros((n, 3), f32),
    )


def _wave_radiance(cfg, st):
    """Final radiance + NaN-watchdog count from a completed wave state
    (ref integrator.rs:581-604 logs NaN/negative/infinite radiance per
    sample; here we count and optionally zero them)."""
    out = st["l"]
    bad = ~jnp.isfinite(out) | (out < -1e-5)
    n_bad = jnp.sum(jnp.any(bad, axis=-1).astype(jnp.float32))
    if cfg.sanitize:
        out = jnp.where(jnp.isfinite(out), out, 0.0)
    return out, n_bad


def _wave_bounce(scene, cfg, bounce, st, draw, draw2, draw2_arr=None,
                 rxd=None, ryd=None, defer_shadow=False):
    """ONE wavefront bounce: intersect, Le, NEE, BSDF sample, RR.

    Pure state -> state; `bounce` is a compile-time constant (Sobol dim
    slots, RR gating and the final-bounce Le-only tail all specialize).
    trace_wave unrolls this for every bounce inside one program; the
    segmented band renderer jits it per bounce so no single device
    program exceeds the axon lane-bounce fault envelope (render_band's
    sizing comment) regardless of max_depth.

    defer_shadow (segmented + onesample + one-light only): this bounce's
    NEE shadow ray is stored in the state and RESOLVED at the top of the
    next bounce's program, where its any-hit while_loop overlaps that
    program's closest-hit on the TPU runtime (measured ~free).
    """
    sd = scene.data
    f32 = jnp.float32
    from .scene.scene import LIGHT_AREA, MAT_GLASS
    do_nee, one_sample, pick_prob, compact, sort_waves = \
        _wave_flags(scene, cfg)
    stride = _bounce_stride(cfg, scene.n_lights)
    last = bounce == cfg.max_depth
    dim_base = 2 + stride * bounce
    defer = (defer_shadow and do_nee and one_sample
             and cfg.light_strategy == "one")

    st = dict(st)
    o, d = st["o"], st["d"]
    n = o.shape[0]
    l, beta, active = st["l"], st["beta"], st["active"]
    specular = st["specular"]
    prev_pdf, prev_p = st["prev_pdf"], st["prev_p"]
    prev_perr, prev_ng = st["prev_perr"], st["prev_ng"]

    n_live = jnp.sum(active.astype(f32))
    st["n_live"] = n_live
    st["rays"] = st["rays"] + n_live
    if compact:
        t_in = jnp.where(active, jnp.inf, 0.0).astype(f32)
        if sort_waves and bounce > 0:
            key = jnp.where(active, st["prev_steps"], jnp.int32(1 << 30))
            from .ops.sort import cost_argsort
            perm = cost_argsort(key)
            hit_p = _scene_intersect(scene, o[perm], d[perm],
                                     t_in[perm], count_steps=True)
            # O(n) scatter inverse (a second argsort would re-sort)
            inv = jnp.zeros((n,), jnp.int32).at[perm].set(
                jnp.arange(n, dtype=jnp.int32))
            hit = {k: v[inv] for k, v in hit_p.items()}
        else:
            hit = _scene_intersect(scene, o, d, t_in,
                                   count_steps=sort_waves)
        if sort_waves:
            st["prev_steps"] = hit.pop("steps")
    else:
        hit = _scene_intersect(scene, o, d,
                               jnp.full((n,), jnp.inf, f32))
    found = hit["valid"] & active

    if defer:
        # resolve the PREVIOUS bounce's deferred shadow ray: its any-hit
        # while_loop is independent of this bounce's closest-hit above,
        # so the runtime overlaps the two traversals
        occ_prev = _scene_intersect_p(
            scene, st["pend_o"], st["pend_d"],
            jnp.where(st["pend_mask"], st["pend_t"], 0.0))
        l = l + jnp.where((st["pend_mask"] & ~occ_prev)[..., None],
                          st["pend_contrib"], 0.0)
        st["pend_mask"] = jnp.zeros((n,), bool)

    # emitted radiance. "ref" mode: camera/specular bounces only
    # (:418-427); "onesample": every vertex, MIS-weighted against the
    # light-sampling density of the previous vertex (pbrt-v4 form).
    le_mask = active if bounce == 0 else (active & specular)
    if last:
        # only Le survives the final bounce — skip the frame build
        le_hit, hl = ia.hit_emission(scene.tri_attr, hit, -d)
    else:
        it = ia.make_interaction(sd, o, d, hit, scene.tri_attr)
        # camera-ray differentials -> duvdx/duvdy for mip filter widths
        # (only the first hit: deeper rays carry no differentials in
        # the reference either, integrator.rs:449-468 spawn_ray)
        duv = ia.compute_duv(it, o, rxd, ryd) \
            if (bounce == 0 and rxd is not None) else None
        if scene.has_normal_maps:
            it = ia.apply_normal_mapping(sd, it, duv=duv)
        le_hit = ia.emitted_radiance(it, -d)
        hl = it["area_light"]
    if one_sample:
        from .ops.gather import take_rows
        if bounce == 0 or LIGHT_AREA not in scene.light_set:
            w_area = jnp.ones((n,), f32)
        else:
            lrows_h = take_rows(scene.light_attr,
                                jnp.maximum(hl, 0))
            lpdf = lt.pdf_li(sd, lrows_h, prev_p, prev_perr, prev_ng,
                             d, light_set=(LIGHT_AREA,)) * pick_prob
            w_area = jnp.where(specular, 1.0,
                               pm.power_heuristic(1.0, prev_pdf,
                                                  1.0, lpdf))
        l = l + jnp.where((active & found)[..., None],
                          beta * le_hit * w_area[..., None], 0.0)
    else:
        l = l + jnp.where((le_mask & found)[..., None],
                          beta * le_hit, 0.0)
    if scene.has_env:
        le_env = lt.env_le(sd, d)
        if one_sample:
            if bounce == 0:
                w_env = jnp.ones((n,), f32)
            else:
                epdf = lt.env_pdf_li(sd, d) * pick_prob
                w_env = jnp.where(specular, 1.0,
                                  pm.power_heuristic(1.0, prev_pdf,
                                                     1.0, epdf))
            l = l + jnp.where((active & ~hit["valid"])[..., None],
                              beta * le_env * w_env[..., None], 0.0)
        else:
            l = l + jnp.where((le_mask & ~hit["valid"])[..., None],
                              beta * le_env, 0.0)
    if last:
        st["l"] = l
        return st

    cont = found
    mp = bx.gather_params(sd, it["material"], it["uv"],
                          mat_attr=scene.mat_attr, has_tex=scene.has_tex,
                          duv=duv, tex_channels=scene.tex_channels)
    wo = -d

    # --- NEE (:443-447) for materials with non-specular lobes;
    # statically skipped for specular-only or lightless scenes
    rays = st["rays"]
    if do_nee:
        nonspec = bx.has_nonspecular(mp["mtype"]) & cont
        shadow_rays = 1.0 if one_sample else 2.0
        if cfg.light_strategy == "all":
            # uniform_sample_all_lights (integrator.rs:141-189): one
            # sample per light, own dim slots, summed (no 1/L scaling)
            ld = jnp.zeros((n, 3), f32)
            for li_i in range(scene.n_lights):
                db = dim_base + DIMS_PER_BOUNCE + 4 * li_i
                if draw2_arr is not None:
                    # per-sample 2D ARRAYS: the n_lights points form a
                    # latin-hypercube set (ref get_2d_array fills via
                    # latin_hyper_cube_2d, integrator.rs:152-153)
                    u_light = draw2_arr(dim_base + DIMS_PER_BOUNCE,
                                        li_i, scene.n_lights)
                    u_scatt = None if one_sample else draw2_arr(
                        dim_base + DIMS_PER_BOUNCE + 1, li_i,
                        scene.n_lights)
                else:
                    u_light = draw2(db)
                    u_scatt = None if one_sample else draw2(db + 2)
                idx_i = jnp.full((n,), li_i, jnp.int32)
                ld = ld + estimate_direct(scene, cfg, it, mp, u_scatt,
                                          u_light, idx_i, wo,
                                          bsdf_branch=not one_sample)
            l = l + jnp.where(nonspec[..., None], beta * ld, 0.0)
            rays = rays + shadow_rays * scene.n_lights * \
                jnp.sum(nonspec.astype(f32))
        else:
            u_light = draw2(dim_base + DIM_U_LIGHT)
            u_scatt = None if one_sample else \
                draw2(dim_base + DIM_U_SCATTER)
            n_l = np.float32(scene.n_lights)
            if scene.n_lights > 1:
                u_pick = draw(dim_base + DIM_LIGHT_PICK)
                light_idx = jnp.minimum((u_pick * n_l).astype(jnp.int32),
                                        scene.n_lights - 1)
            else:
                light_idx = jnp.zeros((n,), jnp.int32)
            if defer:
                contrib, (b1, so_, sd_, st_) = estimate_direct(
                    scene, cfg, it, mp, u_scatt, u_light, light_idx, wo,
                    bsdf_branch=False, pick_prob=pick_prob,
                    defer_shadow=True)
                st["pend_mask"] = nonspec & b1
                st["pend_o"] = so_
                st["pend_d"] = sd_
                st["pend_t"] = st_
                st["pend_contrib"] = jnp.where(nonspec[..., None],
                                               beta * contrib, 0.0)
            else:
                ld = estimate_direct(scene, cfg, it, mp, u_scatt, u_light,
                                     light_idx, wo,
                                     bsdf_branch=not one_sample,
                                     pick_prob=pick_prob if one_sample
                                     else 1.0)
                scale = 1.0 if one_sample else n_l
                l = l + jnp.where(nonspec[..., None], beta * ld * scale,
                                  0.0)
            rays = rays + shadow_rays * jnp.sum(nonspec.astype(f32))
    st["rays"] = rays

    # --- BSDF sampling for the next bounce (:449-468)
    u_bsdf = draw2(dim_base + DIM_BSDF)
    wo_l = _to_local(it, wo)
    bs = bx.sample_f(
        mp, wo_l, u_bsdf,
        lambda wi_loc: (pm.dot(_to_world(it, wi_loc), it["ng"])
                        * pm.dot(wo, it["ng"])) > 0.0,
        present=scene.mat_set)
    wi_w = _to_world(it, bs["wi"])
    cos_ns = jnp.abs(pm.dot(wi_w, it["ns"]))
    dead = jnp.all(bs["f"] == 0.0, axis=-1) | (bs["pdf"] == 0.0)
    new_beta = beta * bs["f"] * \
        (cos_ns / jnp.maximum(bs["pdf"], 1e-20))[..., None]
    cont2 = cont & ~dead
    beta = jnp.where(cont2[..., None], new_beta, beta)
    st["specular"] = jnp.where(cont2, bs["specular"], specular)
    if one_sample:
        # next vertex's MIS weight needs this vertex's sampling state
        st["prev_pdf"] = jnp.where(cont2, bs["pdf"], prev_pdf)
        st["prev_p"] = jnp.where(cont2[..., None], it["p"], prev_p)
        st["prev_perr"] = jnp.where(cont2[..., None], it["p_error"],
                                    prev_perr)
        st["prev_ng"] = jnp.where(cont2[..., None], it["ng"], prev_ng)

    # eta_scale for RR through glass (:471-480); only glass scenes
    if MAT_GLASS in scene.mat_set and cfg.rr_enable:
        spec_trans = bs["specular"] & bs["transmission"]
        eta = mp["eta"]
        scale = jnp.where(pm.dot(wo, it["ng"]) > 0.0, eta * eta,
                          1.0 / jnp.maximum(eta * eta, 1e-20))
        st["eta_scale"] = jnp.where(cont2 & spec_trans,
                                    st["eta_scale"] * scale,
                                    st["eta_scale"])

    new_o = ia.spawn_ray(it["p"], it["p_error"], it["ng"], wi_w)
    st["o"] = jnp.where(cont2[..., None], new_o, o)
    st["d"] = jnp.where(cont2[..., None], wi_w, d)

    # --- Russian roulette (:486-497): compiles out below start depth
    if cfg.rr_enable and bounce > cfg.rr_start_depth:
        rr_beta_max = jnp.max(beta * st["eta_scale"][..., None], axis=-1)
        rr_gate = cont2 & (rr_beta_max < cfg.rr_threshold)
        u_rr = draw(dim_base + DIM_RR)
        q = jnp.maximum(0.05, 1.0 - rr_beta_max)
        rr_kill = rr_gate & (u_rr < q)
        beta = jnp.where((rr_gate & ~rr_kill)[..., None],
                         beta / (1.0 - q)[..., None], beta)
        cont2 = cont2 & ~rr_kill

    st["l"] = l
    st["beta"] = beta
    st["active"] = cont2
    return st


@functools.partial(jax.jit,
                   static_argnames=("cfg", "spp", "band_shape", "filter_f1d",
                                    "total_spp_log2", "filter_radius"))
def render_band(scene, cfg: PathConfig, spp: int, band_shape: tuple[int, int],
                valid_lanes, film_pad, band_x0, band_y0, px, py, b_base,
                scramble, frame_lo, frame_hi, frame_delta, frame_base,
                inv_lo, inv_hi, r2c, cam_rot, cam_pos, filter_f1d,
                sobol_pack, sobol_scale, sobol_off_x, sobol_off_y,
                total_spp_log2: int = 0, filter_radius: float = 2.0,
                dxdy_cam=None, diff_scale=1.0):
    """Render `spp` sampler frames for one row band into the padded film.

    band_shape = (Th, Tw); px/py: (Th*Tw,) absolute pixel coords;
    valid_lanes: (Th*Tw,) bool (padding rows are zero-weight). frame_*:
    (spp,) host Sobol constants per sample index; frame_base: global index
    of the chunk's first frame (stratified/random samplers). dxdy_cam:
    (2, 3) camera raster-step offsets (Camera.diff_params) enabling ray
    differentials; diff_scale: 1/sqrt(total spp) (ray.rs:30-35).
    """
    th, tw = band_shape
    pxf = px.astype(jnp.float32)
    pyf = py.astype(jnp.float32)
    valid = valid_lanes.reshape(th, tw)

    def per_frame(s, carry):
        if cfg.count_occupancy:
            film_pad, rays_total, bad_total, occ_total = carry
        else:
            film_pad, rays_total, bad_total = carry
        draw2_arr = None
        if cfg.sampler == "sobol":
            idx_lo, idx_hi = sb.sobol_index(
                b_base, frame_delta[s], frame_lo[s], frame_hi[s],
                inv_lo, inv_hi)
            draw = lambda dim: sb.sobol_sample_dim(
                idx_lo, idx_hi, dim, scramble, sobol_pack)
            draw2 = lambda dim: sb.sobol_sample_dim2(
                idx_lo, idx_hi, dim, scramble, sobol_pack)
            # camera: dims 0,1 remapped into the pixel. DEVIATION: drawn
            # UNSCRAMBLED — the interval-to-index property (each pixel's
            # indices land in its own cell) only holds for the raw
            # sequence; the reference XORs its cantor scramble into dims
            # 0/1 too (sampler/sobol.rs:185-192), which defeats the remap
            # and collapses most camera jitters to the clamp bounds.
            # PBRT's SobolSampler leaves dims 0/1 unscrambled.
            s01 = sb.sobol_sample_dim2(idx_lo, idx_hi, 0,
                                       jnp.zeros_like(scramble), sobol_pack)
            jx = jnp.clip(s01[..., 0] * sobol_scale + sobol_off_x - pxf,
                          0.0, pm.ONE_MINUS_EPSILON)
            jy = jnp.clip(s01[..., 1] * sobol_scale + sobol_off_y - pyf,
                          0.0, pm.ONE_MINUS_EPSILON)
        else:
            from .ops import samplers as smp
            frame = frame_base + s
            pixel_hash = smp.hash_combine(px.astype(jnp.uint32),
                                          smp.hash_u32(py.astype(jnp.uint32)))
            if cfg.sampler == "stratified":
                draw = lambda dim: smp.stratified_sample_dim(
                    pixel_hash, frame, total_spp_log2, dim)
                # consecutive-dim pairs are 2D-GRID stratified, matching
                # stratified_sample_2d + shuffle (sampling.rs:20-58)
                draw2 = lambda dim: smp.stratified_sample_dim2(
                    pixel_hash, frame, total_spp_log2, dim)
                draw2_arr = lambda dim, i, n: smp.lhs_2d_dim(
                    pixel_hash, frame, dim, i, n)
            else:
                draw = lambda dim: smp.random_sample_dim(
                    pixel_hash, frame, dim)
                draw2 = lambda dim: jnp.stack([draw(dim), draw(dim + 1)],
                                              axis=-1)
            jx = draw(0)
            jy = draw(1)
        p_film = jnp.stack([pxf + jx, pyf + jy], axis=-1)
        # differentials feed mip filter widths — only built when some
        # texture will consume them (static skip otherwise).
        # PTPU_NO_DIFF=1 forces the no-differential path (every texture
        # lookup takes the width-0 level-0 bilinear fast path) — an A/B
        # knob for diagnosing mip-selection artifacts (tools/diag_gallery).
        if (dxdy_cam is not None
                and (scene.has_tex or scene.has_normal_maps)
                and not os.environ.get("PTPU_NO_DIFF")):
            o, d, rxd, ryd = generate_rays_diff(
                r2c, cam_rot, cam_pos, p_film, dxdy_cam, diff_scale)
        else:
            o, d = generate_rays(r2c, cam_rot, cam_pos, p_film)
            rxd = ryd = None
        radiance, rays, n_bad, occ = trace_wave(scene, cfg, draw, draw2,
                                                o, d, rxd, ryd,
                                                draw2_arr=draw2_arr,
                                                lane_valid=valid_lanes)
        tile = splat_tile(radiance.reshape(th, tw, 3),
                          jx.reshape(th, tw), jy.reshape(th, tw),
                          valid, filter_f1d, radius=filter_radius)
        film_pad = film_pad_accumulate(film_pad, tile, band_x0, band_y0,
                                       half=splat_halfwidth(filter_radius))
        if cfg.count_occupancy:
            return (film_pad, rays_total + rays, bad_total + n_bad,
                    occ_total + occ)
        return film_pad, rays_total + rays, bad_total + n_bad

    zero = jnp.float32(0.0)
    if cfg.count_occupancy:
        out = jax.lax.fori_loop(
            0, spp, per_frame,
            (film_pad, zero, zero, jnp.zeros((cfg.max_depth + 1,),
                                             jnp.float32)))
        return out
    film_pad, rays_t, bad_t = jax.lax.fori_loop(0, spp, per_frame,
                                                (film_pad, zero, zero))
    return film_pad, rays_t, bad_t, jnp.zeros((cfg.max_depth + 1,),
                                              jnp.float32)


# lane-bounce budget for fused BVH bounce programs on the axon TPU backend
# (see render_progressive band sizing); 6 segments x 65536 rays is the
# largest configuration proven stable on hardware. Big scenes sidestep it
# entirely via the SEGMENTED band renderer below (one jitted program per
# bounce, so program size is depth-independent by construction).
_WAVE_DEPTH_BUDGET = 6 * 65536
# trees below this row count keep the fused whole-wave program even when
# the envelope binds (small scenes fit it anyway; fusion wins)
_SEG_MIN_ROWS = 2048


def _seg_gen_impl(scene, cfg, px, py, b_base, scramble,
                  f_lo, f_hi, f_delta, frame, inv_lo, inv_hi,
                  r2c, cam_rot, cam_pos, sobol_pack, sobol_scale,
                  sobol_off_x, sobol_off_y, total_spp_log2=0,
                  dxdy_cam=None, diff_scale=1.0, lane_valid=None):
    """Segmented renderer, stage 1: camera rays + sampler state for ONE
    sample frame of one band (the ray-gen half of render_band.per_frame).

    Returns (wave state, aux sampler arrays, jx, jy, rxd, ryd)."""
    from .ops import samplers as smp
    pxf = px.astype(jnp.float32)
    pyf = py.astype(jnp.float32)
    aux = dict(
        pixel_hash=smp.hash_combine(px.astype(jnp.uint32),
                                    smp.hash_u32(py.astype(jnp.uint32))),
        frame=frame,
        idx_lo=jnp.zeros_like(px, jnp.uint32),
        idx_hi=jnp.zeros_like(px, jnp.uint32),
    )
    if cfg.sampler == "sobol":
        idx_lo, idx_hi = sb.sobol_index(b_base, f_delta, f_lo, f_hi,
                                        inv_lo, inv_hi)
        aux["idx_lo"], aux["idx_hi"] = idx_lo, idx_hi
        # camera dims 0,1: unscrambled remap (see render_band.per_frame)
        s01 = sb.sobol_sample_dim2(idx_lo, idx_hi, 0,
                                   jnp.zeros_like(scramble), sobol_pack)
        jx = jnp.clip(s01[..., 0] * sobol_scale + sobol_off_x - pxf,
                      0.0, pm.ONE_MINUS_EPSILON)
        jy = jnp.clip(s01[..., 1] * sobol_scale + sobol_off_y - pyf,
                      0.0, pm.ONE_MINUS_EPSILON)
    else:
        draw, _, _ = _seg_draws(cfg, aux, scramble, sobol_pack,
                                total_spp_log2)
        jx = draw(0)
        jy = draw(1)
    p_film = jnp.stack([pxf + jx, pyf + jy], axis=-1)
    if (dxdy_cam is not None and (scene.has_tex or scene.has_normal_maps)
            and not os.environ.get("PTPU_NO_DIFF")):
        o, d, rxd, ryd = generate_rays_diff(r2c, cam_rot, cam_pos, p_film,
                                            dxdy_cam, diff_scale)
    else:
        o, d = generate_rays(r2c, cam_rot, cam_pos, p_film)
        rxd = ryd = None
    st = _wave_init(scene, cfg, o, d, lane_valid=lane_valid)
    return st, aux, jx, jy, rxd, ryd


_seg_gen = functools.partial(
    jax.jit, static_argnames=("cfg", "total_spp_log2"))(_seg_gen_impl)


def _seg_draws(cfg, aux, scramble, sobol_pack, total_spp_log2):
    """Rebuild the per-frame draw closures from the aux sampler arrays
    (mirrors render_band.per_frame's closure construction)."""
    from .ops import samplers as smp
    if cfg.sampler == "sobol":
        draw = lambda dim: sb.sobol_sample_dim(
            aux["idx_lo"], aux["idx_hi"], dim, scramble, sobol_pack)
        draw2 = lambda dim: sb.sobol_sample_dim2(
            aux["idx_lo"], aux["idx_hi"], dim, scramble, sobol_pack)
        return draw, draw2, None
    if cfg.sampler == "stratified":
        draw = lambda dim: smp.stratified_sample_dim(
            aux["pixel_hash"], aux["frame"], total_spp_log2, dim)
        draw2 = lambda dim: smp.stratified_sample_dim2(
            aux["pixel_hash"], aux["frame"], total_spp_log2, dim)
        draw2_arr = lambda dim, i, n: smp.lhs_2d_dim(
            aux["pixel_hash"], aux["frame"], dim, i, n)
        return draw, draw2, draw2_arr
    draw = lambda dim: smp.random_sample_dim(aux["pixel_hash"],
                                             aux["frame"], dim)
    draw2 = lambda dim: jnp.stack([draw(dim), draw(dim + 1)], axis=-1)
    return draw, draw2, None


def _seg_bounce_impl(scene, cfg, bounce, st, aux, scramble, sobol_pack,
                     total_spp_log2=0, rxd=None, ryd=None):
    """Segmented renderer, stage 2: ONE jitted bounce (own device
    program — the program-size fault envelope no longer scales with
    max_depth, so 131k-ray waves run at any depth). NEE shadow rays are
    deferred into the next bounce's program (see _wave_bounce)."""
    draw, draw2, draw2_arr = _seg_draws(cfg, aux, scramble, sobol_pack,
                                        total_spp_log2)
    return _wave_bounce(scene, cfg, bounce, st, draw, draw2,
                        draw2_arr=draw2_arr, rxd=rxd, ryd=ryd,
                        defer_shadow=True)


_seg_bounce = functools.partial(
    jax.jit, static_argnames=("cfg", "bounce", "total_spp_log2"))(
        _seg_bounce_impl)


def _seg_splat_impl(cfg, band_shape, st, jx, jy, valid_lanes, film_pad,
                    band_x0, band_y0, filter_f1d, filter_radius=2.0):
    """Segmented renderer, stage 3: radiance watchdog + tile splat."""
    th, tw = band_shape
    radiance, n_bad = _wave_radiance(cfg, st)
    tile = splat_tile(radiance.reshape(th, tw, 3),
                      jx.reshape(th, tw), jy.reshape(th, tw),
                      valid_lanes.reshape(th, tw), filter_f1d,
                      radius=filter_radius)
    film_pad = film_pad_accumulate(film_pad, tile, band_x0, band_y0,
                                   half=splat_halfwidth(filter_radius))
    return film_pad, st["rays"], n_bad


_seg_splat = functools.partial(
    jax.jit, static_argnames=("cfg", "band_shape", "filter_f1d",
                              "filter_radius"))(_seg_splat_impl)


class PathIntegrator:
    """Host-side driver mirroring the reference render() entry
    (integrator.rs:536-642): builds the sample-bounds pixel grid, batches
    it into row bands, and runs the jitted band renderer.
    """

    def __init__(self, cfg: PathConfig = PathConfig(), spp: int = 4,
                 filter_kind: str = "gaussian", band_rows: int | None = None):
        self.cfg = cfg
        self.spp = pm.round_up_pow2(spp)
        self.filter_table, self.filter_radius = make_filter(filter_kind)
        f1d, _ = make_filter_f1d(filter_kind)
        self.filter_f1d = tuple(float(v) for v in f1d)
        self.band_rows = band_rows
        self.last_ray_count = 0.0
        self.bad_sample_count = 0.0
        # per-bounce live-lane totals (wavefront queue occupancy; the TPU
        # analogue of the reference's per-module trace logging, SURVEY §5)
        self.bounce_occupancy = np.zeros(0, np.float64)

    def render(self, camera: Camera, scene) -> jnp.ndarray:
        """Returns the (H, W, 4) film accumulator."""
        return self.render_progressive(camera, scene, chunk_spp=self.spp)

    def _band_segmented(self, scene, band_shape, valid, film_pad,
                        x0, by0, px, py, b_base, scramble,
                        f_lo, f_hi, f_delta, frame, inv_lo, inv_hi,
                        r2c, cam_rot, cam_pos, ft, sobol_pack,
                        sobol_scale, sobol_off_x, sobol_off_y,
                        dxdy_cam, diff_scale):
        """One sample frame of one band as per-bounce jitted segments
        (ray-gen -> max_depth+1 bounce programs -> splat). Device
        programs stay below the axon fault envelope at ANY depth, so
        this path has no wave cap and no chunk=1 forcing.

        The expensive gen/bounce programs are shape-keyed ONLY by the
        flat lane count (the driver pads it to the wave cap) and the
        total_spp_log2 static is normalized away for samplers that
        ignore it, so one compiled set serves every resolution and spp
        (cold remote compiles cost 2-6 min per bounce program on this
        backend). Padded tail lanes are sliced off before the splat,
        whose program is keyed by the true band shape (cheap compile)."""
        cfg = self.cfg
        # sobol/random draws never read total_spp_log2; pinning the
        # static to 0 lets spp=1 e2e, spp=4 bench and spp=64 gallery
        # share the same compiled bounce programs.
        tsl = pm.log2_int(self.spp) if cfg.sampler == "stratified" else 0
        # pad the validity mask to the (possibly compile-padded) lane
        # count: pad-tail lanes start INACTIVE (no traversal cost, no
        # ray-count inflation — ADVICE r4)
        n_lanes = px.shape[0]
        lv = valid
        if lv.shape[0] != n_lanes:
            lv = jnp.concatenate(
                [lv, jnp.zeros((n_lanes - lv.shape[0],), bool)])
        st, aux, jx, jy, rxd, ryd = _seg_gen(
            scene, cfg, px, py, b_base, scramble,
            f_lo, f_hi, f_delta, frame, inv_lo, inv_hi,
            r2c, cam_rot, cam_pos, sobol_pack, sobol_scale,
            sobol_off_x, sobol_off_y, total_spp_log2=tsl,
            dxdy_cam=dxdy_cam, diff_scale=diff_scale, lane_valid=lv)
        occs = []
        for bounce in range(cfg.max_depth + 1):
            st = _seg_bounce(scene, cfg, bounce, st, aux, scramble,
                             sobol_pack, total_spp_log2=tsl,
                             rxd=rxd if bounce == 0 else None,
                             ryd=ryd if bounce == 0 else None)
            if cfg.count_occupancy:
                occs.append(st["n_live"])
        n0 = band_shape[0] * band_shape[1]
        if st["o"].shape[0] != n0:  # drop compile-padding tail lanes
            n_pad = st["o"].shape[0]
            for k, v in st.items():
                # every lane-major array must carry exactly the padded
                # lane count; anything else would be silently truncated
                # by the slice below (ADVICE r4)
                assert getattr(v, "ndim", 0) == 0 or \
                    v.shape[0] in (n_pad, 1), \
                    f"non-lane-major wave entry {k}: {v.shape}"
            st = {k: (v[:n0] if getattr(v, "ndim", 0) >= 1
                      and v.shape[0] == n_pad else v)
                  for k, v in st.items()}
            jx, jy = jx[:n0], jy[:n0]
        film_pad, rays, n_bad = _seg_splat(
            cfg, band_shape, st, jx, jy, valid, film_pad, x0, by0,
            filter_f1d=ft, filter_radius=self.filter_radius)
        occ = (jnp.stack(occs) if cfg.count_occupancy
               else jnp.zeros((cfg.max_depth + 1,), jnp.float32))
        return film_pad, rays, n_bad, occ

    def render_progressive(self, camera: Camera, scene,
                           chunk_spp: int | None = None, callback=None,
                           checkpoint: str | None = None) -> jnp.ndarray:
        """Render in sample-index chunks, invoking ``callback(film, done)``
        after each chunk (the reference's 2-second progressive preview,
        headless.rs:197-214, recast as chunked sample batches).

        If ``checkpoint`` is set, the film accumulator and next sample
        index are persisted there after every chunk and resumed from on
        start (SURVEY §5 checkpoint/resume: the additive accumulator makes
        this exact).
        """
        import os
        # np.savez always appends .npz to extension-less paths; normalize
        # once so save and the resume check agree on the same file.
        if checkpoint and not checkpoint.endswith(".npz"):
            checkpoint = checkpoint + ".npz"
        if not isinstance(scene, TracedScene):
            scene = TracedScene.create(scene)
        self.last_ray_count = 0.0
        self.bad_sample_count = 0.0
        self.bounce_occupancy = np.zeros(self.cfg.max_depth + 1, np.float64)
        w, h = camera.resolution
        (x0, y0), (x1, y1) = sample_bounds(w, h, self.filter_radius)
        ws, hs = x1 - x0, y1 - y0
        domain = sb.SobolDomain.create((x0, y0), (x1, y1), self.spp)

        # ~131k-ray waves amortize per-pass overheads. For BVH scenes the
        # axon TPU worker faults when the unrolled bounce program exceeds
        # roughly (max_depth+1) x rays ~ 700k lane-bounces (bisect matrix,
        # tools/crash_matrix.py: depth-5 x 131k rays CRASHES bare
        # trace_wave, depth-4 x 131k and depth-5 x 65k PASS full renders),
        # so waves are capped at a tested-safe 393k/(depth+1) budget there.
        # SEGMENTED mode (one jitted program per bounce) escapes the
        # lane-bounce fault envelope by construction: program size is
        # depth-independent, so big-scene waves run full-size at any
        # depth. Small trees keep the fused whole-wave program (cross-
        # bounce fusion wins when the envelope doesn't bind).
        bw = getattr(scene, "bw_rows", None)
        segmented = (bw is not None and bw.shape[0] >= _SEG_MIN_ROWS
                     and (self.cfg.max_depth + 1) * min(1 << 17, ws * hs)
                     > _WAVE_DEPTH_BUDGET)
        if self.band_rows:
            band = self.band_rows
        else:
            from . import tuning
            wave_cap = 1 << 17
            if segmented:
                # segmented scenes have no fault envelope; rays-per-launch
                # is a measured knob (tpu_session eband sweep -> auto_tune)
                wave_cap = tuning.get("seg_wave_lanes", wave_cap)
            elif getattr(scene, "bvh", None) is not None:
                wave_cap = min(wave_cap,
                               _WAVE_DEPTH_BUDGET // (self.cfg.max_depth + 1))
            band = max(1, wave_cap // ws)
            if getattr(scene, "bvh", None) is None:
                # dense-intersect scenes (cornell-class): band height is a
                # measured knob (tpu_session cband sweep -> auto_tune)
                band = tuning.get("band_rows_dense", band)
        band = min(band, hs)
        n_bands = -(-hs // band)
        chunk = pm.round_up_pow2(min(chunk_spp or self.spp, self.spp))
        if getattr(scene, "bvh", None) is not None and not segmented:
            # the lane-bounce budget is per LAUNCH (the spp fori_loop rides
            # inside render_band): bench spp=4 at a tested-safe 65k-ray
            # band still faulted, 1 frame/launch at the same band passes.
            per_frame = (self.cfg.max_depth + 1) * band * ws
            chunk = max(1, min(chunk, _WAVE_DEPTH_BUDGET // max(per_frame, 1)))

        inv_lo, inv_hi = sb.vdc_inv_rows(domain)
        sobol_pack = sb.sm32_device()
        r2c, cam_rot, cam_pos = camera.ray_params()
        ft = self.filter_f1d

        film_pad = film_pad_new(w, h, extra_rows=band)
        s_start = 0
        if checkpoint and os.path.exists(checkpoint):
            ck = np.load(checkpoint)
            if ck["film_pad"].shape == film_pad.shape and \
                    int(ck["spp"]) == self.spp:
                film_pad = jnp.asarray(ck["film_pad"])
                s_start = int(ck["next_frame"])

        # Compile-unification padding (segmented path): pad the flat
        # lane count of near-full waves up to the wave cap so the
        # expensive per-bounce programs (2-6 min cold remote compiles,
        # ~60 MB binaries each) are shape-shared across resolutions —
        # 480p/1080p/bench/gallery all trace exactly wave_cap lanes.
        # Tiny bands (explicit band_rows, small images) stay unpadded.
        seg_pad = 0
        if segmented and not self.band_rows:
            lanes = band * ws
            if wave_cap >= lanes > (wave_cap * 7) // 8:
                seg_pad = wave_cap - lanes

        # per-band pixel statics (host, once)
        bands = []
        for bi in range(n_bands):
            by0 = y0 + bi * band
            xs, ys = np.meshgrid(np.arange(x0, x1),
                                 np.arange(by0, by0 + band), indexing="xy")
            px = xs.ravel().astype(np.int32)
            py = ys.ravel().astype(np.int32)
            valid = py < y1
            if seg_pad:  # dead tail lanes, sliced off before the splat
                px = np.concatenate([px, np.full(seg_pad, px[-1], np.int32)])
                py = np.concatenate([py, np.full(seg_pad, py[-1], np.int32)])
            scramble, b_base = sb.pixel_statics(
                domain, px, np.minimum(py, y1 - 1))
            bands.append((by0, jnp.asarray(px), jnp.asarray(py),
                          jnp.asarray(valid), jnp.asarray(b_base),
                          jnp.asarray(scramble)))

        for s0 in range(s_start, self.spp, chunk):
            n_frames = min(chunk, self.spp - s0)
            frame_lo = np.zeros(chunk, np.uint32)
            frame_hi = np.zeros(chunk, np.uint32)
            frame_delta = np.zeros(chunk, np.uint32)
            for i in range(n_frames):
                frame_lo[i], frame_hi[i], frame_delta[i] = \
                    sb.frame_statics(domain, s0 + i)
            stats = []  # device scalars; one sync per chunk, not per band
            for by0, px, py, valid, b_base, scramble in bands:
                if segmented:
                    for i in range(n_frames):
                        film_pad, rays, n_bad, occ = self._band_segmented(
                            scene, (band, ws), valid, film_pad,
                            jnp.int32(x0), jnp.int32(by0), px, py, b_base,
                            scramble, jnp.uint32(frame_lo[i]),
                            jnp.uint32(frame_hi[i]),
                            jnp.uint32(frame_delta[i]),
                            jnp.int32(s0 + i), inv_lo, inv_hi,
                            r2c, cam_rot, cam_pos, ft, sobol_pack,
                            jnp.float32(domain.resolution),
                            jnp.float32(domain.p_min[0]),
                            jnp.float32(domain.p_min[1]),
                            camera.diff_params(),
                            jnp.float32(1.0 / np.sqrt(self.spp)))
                        stats.append((rays, n_bad, occ))
                else:
                    film_pad, rays, n_bad, occ = render_band(
                        scene, self.cfg, n_frames, (band, ws), valid,
                        film_pad,
                        jnp.int32(x0), jnp.int32(by0), px, py, b_base,
                        scramble,
                        jnp.asarray(frame_lo), jnp.asarray(frame_hi),
                        jnp.asarray(frame_delta), jnp.int32(s0),
                        inv_lo, inv_hi,
                        r2c, cam_rot, cam_pos, ft, sobol_pack,
                        jnp.float32(domain.resolution),
                        jnp.float32(domain.p_min[0]),
                        jnp.float32(domain.p_min[1]),
                        total_spp_log2=pm.log2_int(self.spp),
                        filter_radius=self.filter_radius,
                        dxdy_cam=camera.diff_params(),
                        diff_scale=jnp.float32(1.0 / np.sqrt(self.spp)))
                    stats.append((rays, n_bad, occ))
            for rays, n_bad, occ in stats:
                self.last_ray_count += float(rays)
                self.bad_sample_count += float(n_bad)
                self.bounce_occupancy += np.asarray(occ, np.float64)
            if callback is not None:
                callback(film_crop(film_pad, w, h), s0 + n_frames)
            if checkpoint:
                np.savez(checkpoint, film_pad=np.asarray(film_pad),
                         next_frame=s0 + n_frames, spp=self.spp)
        return film_crop(film_pad, w, h)
