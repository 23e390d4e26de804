"""Pallas TPU kernel: brute-force watertight ray-triangle intersection.

The device kernel the reference's OptiX backend only stubbed
(gpu/device_programs.cu:25-79): rays stream through VMEM in blocks, the
triangle soup stays resident in VMEM, and the closest-hit reduction runs
in registers — no (N, F) HBM intermediates like the XLA brute-force path
materializes. Same watertight Woop test + conservative error bounds as
ops/intersect.py (ref shape.rs:74-360).

Layout: rays as SoA components reshaped (N/128, 128) — Mosaic's native
(sublane, lane) tiling; 1-D vectors trip i1/i8 layout bugs. Triangles ride
along as an (F, 12) record table — SMEM on the production F <= 128 path so
vertex components are native scalar-core reads broadcast against the ray
block (a VMEM row load needs per-element vector extracts), VMEM rows on
the big-F loop fallbacks. The unrolled loop runs ``chains``
independent closest-hit accumulators merged at the end, breaking the
serial best-t dependency between consecutive triangle tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.math import gamma

GAMMA2 = gamma(2)
GAMMA3 = gamma(3)
GAMMA5 = gamma(5)

BLOCK = 8192
BIG = np.float32(3.0e38)


def _sel3(k, a, b, c):
    return jnp.where(k == 0, a, jnp.where(k == 1, b, c))


def _merge_carry(a, b):
    """Merge two independent closest-hit accumulator chains."""
    take = b[0] < a[0]
    return (jnp.where(take, b[0], a[0]), jnp.where(take, b[1], a[1]),
            jnp.where(take, b[2], a[2]), jnp.where(take, b[3], a[3]),
            jnp.where(take, b[4], a[4]), jnp.maximum(a[5], b[5]))


def _intersect_kernel(any_hit: bool, f: int, smem: bool, chains: int,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      tmax_ref, tri_ref,
                      t_out, tri_out, b0_out, b1_out, b2_out, hit_out):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    t_max = tmax_ref[:]

    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    kz = jnp.where(adx > ady, jnp.where(adx > adz, 0, 2),
                   jnp.where(ady > adz, 1, 2)).astype(jnp.int32)
    kx = jnp.where(kz == 2, 0, kz + 1)
    ky = jnp.where(kx == 2, 0, kx + 1)

    d_x = _sel3(kx, dx, dy, dz)
    d_y = _sel3(ky, dx, dy, dz)
    d_z = _sel3(kz, dx, dy, dz)
    sx = -d_x / d_z
    sy = -d_y / d_z
    sz = 1.0 / d_z
    o_kx = _sel3(kx, ox, oy, oz)
    o_ky = _sel3(ky, ox, oy, oz)
    o_kz = _sel3(kz, ox, oy, oz)

    def tri_body(i, carry):
        best_t, best_tri, b0b, b1b, b2b, found = carry
        if smem:
            # SMEM rows: native scalar reads on the scalar core (a VMEM
            # row load costs 12 per-element vector extracts here)
            p0x_, p0y_, p0z_ = tri_ref[i, 0], tri_ref[i, 1], tri_ref[i, 2]
            p1x_, p1y_, p1z_ = tri_ref[i, 3], tri_ref[i, 4], tri_ref[i, 5]
            p2x_, p2y_, p2z_ = tri_ref[i, 6], tri_ref[i, 7], tri_ref[i, 8]
        else:
            row = tri_ref[i]  # (12,) VMEM row (big-F fallback)
            p0x_, p0y_, p0z_ = row[0], row[1], row[2]
            p1x_, p1y_, p1z_ = row[3], row[4], row[5]
            p2x_, p2y_, p2z_ = row[6], row[7], row[8]

        def shear(px_, py_, pz_):
            tx = _sel3(kx, px_, py_, pz_) - o_kx
            ty = _sel3(ky, px_, py_, pz_) - o_ky
            tz = _sel3(kz, px_, py_, pz_) - o_kz
            return tx + sx * tz, ty + sy * tz, tz

        p0x, p0y, p0z = shear(p0x_, p0y_, p0z_)
        p1x, p1y, p1z = shear(p1x_, p1y_, p1z_)
        p2x, p2y, p2z = shear(p2x_, p2y_, p2z_)

        e0 = p1x * p2y - p1y * p2x
        e1 = p2x * p0y - p2y * p0x
        e2 = p0x * p1y - p0y * p1x
        neg = (e0 < 0) | (e1 < 0) | (e2 < 0)
        pos = (e0 > 0) | (e1 > 0) | (e2 > 0)
        edge_ok = ~(neg & pos)
        det = e0 + e1 + e2
        det_ok = det != 0.0
        p0z = p0z * sz
        p1z = p1z * sz
        p2z = p2z * sz
        t_scaled = e0 * p0z + e1 * p1z + e2 * p2z
        lim = jnp.minimum(t_max, best_t)
        # logical form instead of select-on-bools (Mosaic rejects i1 selects)
        neg_det = det < 0.0
        range_ok = (neg_det & (t_scaled < 0.0) & (t_scaled >= lim * det)) | \
            (~neg_det & (t_scaled > 0.0) & (t_scaled <= lim * det))
        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
        t = t_scaled * inv_det
        max_zt = jnp.maximum(jnp.abs(p0z),
                             jnp.maximum(jnp.abs(p1z), jnp.abs(p2z)))
        max_xt = jnp.maximum(jnp.abs(p0x),
                             jnp.maximum(jnp.abs(p1x), jnp.abs(p2x)))
        max_yt = jnp.maximum(jnp.abs(p0y),
                             jnp.maximum(jnp.abs(p1y), jnp.abs(p2y)))
        delta_z = GAMMA3 * max_zt
        delta_x = GAMMA5 * (max_xt + max_zt)
        delta_y = GAMMA5 * (max_yt + max_zt)
        delta_e = 2.0 * (GAMMA2 * max_xt * max_yt + delta_y * max_xt
                         + delta_x * max_yt)
        max_e = jnp.maximum(jnp.abs(e0), jnp.maximum(jnp.abs(e1),
                                                     jnp.abs(e2)))
        delta_t = 3.0 * (GAMMA3 * max_e * max_zt + delta_e * max_zt
                         + delta_z * max_e) * jnp.abs(inv_det)
        hit = edge_ok & det_ok & range_ok & (t > delta_t)

        take = hit & (t < best_t)
        best_t = jnp.where(take, t, best_t)
        best_tri = jnp.where(take, i, best_tri)
        b0b = jnp.where(take, e0 * inv_det, b0b)
        b1b = jnp.where(take, e1 * inv_det, b1b)
        b2b = jnp.where(take, e2 * inv_det, b2b)
        # found carried as int32: Mosaic rejects i1 vectors in loop carries
        found = jnp.where(hit, jnp.int32(1), found)
        return best_t, best_tri, b0b, b1b, b2b, found

    shape = ox.shape
    init = (jnp.full(shape, BIG, jnp.float32),
            jnp.zeros(shape, jnp.int32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.int32))

    # NOTE: the dynamic tri_ref[i] row load inside fori/while loops faults
    # the TPU worker (Mosaic dynamic vector indexing); callers keep f <= 128
    # so the unrolled path is always taken on hardware.
    if f <= 128:
        # full unroll over k INDEPENDENT accumulator chains: the running
        # best_t/where chain is the only serial dependency between
        # triangles, so splitting it k ways lets the VPU overlap k tests
        # (merged at the end — closest hit is associative)
        k = max(1, min(chains, f))
        carries = [init] * k
        for i in range(f):
            carries[i % k] = tri_body(i, carries[i % k])
        carry = carries[0]
        for c in carries[1:]:
            carry = _merge_carry(carry, c)
    elif any_hit:
        def cond(state):
            i, carry = state
            return (i < f) & (jnp.min(carry[5]) == 0)

        def wbody(state):
            i, carry = state
            return i + 1, tri_body(i, carry)

        _, carry = jax.lax.while_loop(cond, wbody, (jnp.int32(0), init))
    else:
        carry = jax.lax.fori_loop(0, f, tri_body, init)

    best_t, best_tri, b0b, b1b, b2b, found = carry
    t_out[:] = jnp.where(found == 1, best_t, 0.0)
    tri_out[:] = best_tri
    b0_out[:] = b0b
    b1_out[:] = b1b
    b2_out[:] = b2b
    hit_out[:] = found


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "interpret", "chains"))
def intersect_pallas(o, d, t_max, tri_pack, any_hit: bool = False,
                     interpret: bool = False, chains: int = 4):
    """Closest-hit (or any-hit) over the packed triangle soup.

    o, d: (N, 3); t_max: (N,); tri_pack: (F, 12) f32 [p0 p1 p2 pad] rows.
    N is padded to BLOCK internally. Returns the intersect_brute-style hit
    record (or (N,) bool for any_hit). chains: independent closest-hit
    accumulator chains in the unrolled F <= 128 path.
    """
    n = o.shape[0]
    f = tri_pack.shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    pad = n_pad - n
    rows = BLOCK // 128

    def pad1(x, v=0.0):
        return jnp.pad(x, (0, pad), constant_values=v).reshape(-1, 128)

    ox, oy, oz = (pad1(o[:, i]) for i in range(3))
    dx, dy, dz = (pad1(d[:, i], 1.0) for i in range(3))
    tm = pad1(t_max, 0.0)

    grid = n_pad // BLOCK
    block = lambda: pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    # the unrolled small-F path reads triangle components as SCALARS:
    # serve them from SMEM (f <= 128 -> 6 KB). The big-F loop fallbacks
    # keep VMEM rows (SMEM is KB-scale).
    smem = f <= 128
    tri_spec = pl.BlockSpec((f, 12), lambda i: (0, 0),
                            memory_space=pltpu.SMEM if smem
                            else pltpu.VMEM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((n_pad // 128, 128), dt)
        for dt in (jnp.float32, jnp.int32, jnp.float32, jnp.float32,
                   jnp.float32, jnp.int32))
    t, tri, b0, b1, b2, hit = pl.pallas_call(
        functools.partial(_intersect_kernel, any_hit, f, smem, chains),
        grid=(grid,),
        in_specs=[block() for _ in range(7)] + [tri_spec],
        out_specs=tuple(block() for _ in range(6)),
        out_shape=out_shapes,
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, tm, tri_pack)

    t, tri, b0, b1, b2, hit = (x.reshape(-1)[:n]
                               for x in (t, tri, b0, b1, b2, hit))
    valid = hit != 0
    if any_hit:
        return valid
    return dict(valid=valid, t=t, tri=tri,
                b=jnp.stack([b0, b1, b2], axis=-1))


def pack_triangles(p0, p1, p2) -> np.ndarray:
    """(F, 12) f32 rows: [p0.xyz p1.xyz p2.xyz 0 0 0] (VMEM-friendly pad).

    Host numpy (create-time); TracedScene.create device-pushes once."""
    return np.concatenate(
        [np.asarray(p0, np.float32), np.asarray(p1, np.float32),
         np.asarray(p2, np.float32),
         np.zeros((np.asarray(p0).shape[0], 3), np.float32)], axis=-1)
