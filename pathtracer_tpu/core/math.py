"""Vectorized PBRT-style math utilities.

Behavioral parity with reference ``src/common/math.rs`` (gamma error bounds
:8-10, next_float_up/down :71-105, offset_ray_origin :107-131,
coordinate_system :48-61, power_heuristic :167-171, spherical :173-184,
sRGB :133-147), re-expressed as batched jnp ops. Everything here operates on
arrays of shape (..., 3) / (...,) so the whole wavefront is processed at once.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MACHINE_EPSILON = np.float32(np.finfo(np.float32).eps * 0.5)
ONE_MINUS_EPSILON = np.float32(np.nextafter(np.float32(1.0), np.float32(0.0)))
INV_PI = np.float32(1.0 / np.pi)
INV_2_PI = np.float32(0.5 / np.pi)
PI = np.float32(np.pi)
HALF_MAX_I32 = np.int32(np.iinfo(np.int32).max // 2)
SHADOW_EPSILON = np.float32(1e-4)


def gamma(n: int) -> np.float32:
    """Floating-point error bound gamma(n) = n*eps/(1-n*eps)."""
    ne = np.float32(n) * MACHINE_EPSILON
    return np.float32(ne / (1.0 - ne))


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def norm_sq(v):
    return jnp.sum(v * v, axis=-1)


def norm(v):
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


def normalize(v):
    return v / jnp.maximum(norm(v), 1e-20)[..., None]


def cross(a, b):
    return jnp.cross(a, b)


def face_forward(n, v):
    """Flip n to lie in the same hemisphere as v (ref math.rs:37-46)."""
    return jnp.where((dot(n, v) < 0.0)[..., None], -n, n)


def coordinate_system(v1):
    """Build an orthonormal basis (v1, v2, v3) from a unit vector v1.

    Matches ref math.rs:48-61 branch selection.
    """
    x, y, z = v1[..., 0], v1[..., 1], v1[..., 2]
    use_x = jnp.abs(x) > jnp.abs(y)
    inv_a = 1.0 / jnp.sqrt(jnp.where(use_x, x * x + z * z, y * y + z * z))
    v2 = jnp.where(
        use_x[..., None],
        jnp.stack([-z, jnp.zeros_like(x), x], axis=-1),
        jnp.stack([jnp.zeros_like(x), z, -y], axis=-1),
    ) * inv_a[..., None]
    v3 = jnp.cross(v1, v2)
    return v2, v3


def float_to_bits(f):
    return jnp.asarray(f, jnp.float32).view(jnp.uint32)


def bits_to_float(u):
    return jnp.asarray(u, jnp.uint32).view(jnp.float32)


def next_float_up(v):
    """Next representable float above v, elementwise (ref math.rs:71-88)."""
    v = jnp.asarray(v, jnp.float32)
    v = jnp.where(v == 0.0, jnp.float32(0.0), v)  # collapse -0 → +0
    ui = float_to_bits(v)
    ui_next = jnp.where(v >= 0.0, ui + 1, ui - 1)
    out = bits_to_float(ui_next)
    return jnp.where(jnp.isinf(v) & (v > 0), v, out)


def next_float_down(v):
    """Next representable float below v, elementwise.

    Ref math.rs:90-105 — NOTE: the reference swapped the +-1 bit steps there
    (stepping positive floats up); we implement the correct PBRT semantics.
    """
    v = jnp.asarray(v, jnp.float32)
    is_neg_zero_or_zero = v == 0.0
    ui = float_to_bits(jnp.where(is_neg_zero_or_zero, jnp.float32(-0.0), v))
    # -0.0 has sign bit set, so the v > 0 test routes it to ui + 1 (smallest
    # negative subnormal), matching PBRT.
    ui_next = jnp.where(v > 0.0, ui - 1, ui + 1)
    out = bits_to_float(ui_next)
    return jnp.where(jnp.isinf(v) & (v < 0), v, out)


def offset_ray_origin(p, p_error, n, w):
    """Robustly offset a ray origin off a surface (ref math.rs:107-131).

    All args (..., 3). Conservatively steps the origin along the normal by the
    accumulated FP error bound and rounds away from the surface bitwise.
    """
    d = dot(jnp.abs(n), p_error)
    offset = d[..., None] * n
    offset = jnp.where((dot(w, n) < 0.0)[..., None], -offset, offset)
    po = p + offset
    po = jnp.where(offset > 0.0, next_float_up(po), po)
    po = jnp.where(offset < 0.0, next_float_down(po), po)
    return po


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """Balance-power MIS heuristic beta=2 (ref math.rs:167-171).

    Computed as 1/(1+(g/f)^2) — algebraically identical to f^2/(f^2+g^2)
    but immune to f32 overflow when a pdf is huge (grazing light samples).
    """
    f = nf * f_pdf
    g = ng * g_pdf
    r = g / jnp.maximum(f, 1e-30)
    w = 1.0 / (1.0 + r * r)
    return jnp.where(f > 0.0, w, jnp.zeros_like(w))


def spherical_theta(v):
    return jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))


def spherical_phi(v):
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0.0, p + 2.0 * np.pi, p)


def gamma_correct(value):
    """Linear → sRGB (ref math.rs:133-139)."""
    value = jnp.asarray(value)
    return jnp.where(
        value <= 0.0031308,
        12.92 * value,
        1.055 * jnp.power(jnp.maximum(value, 1e-12), 1.0 / 2.4) - 0.055,
    )


def inverse_gamma_correct(value):
    """sRGB → linear (ref math.rs:141-147)."""
    value = jnp.asarray(value)
    return jnp.where(
        value <= 0.04045,
        value / 12.92,
        jnp.power((value + 0.055) / 1.055, 2.4),
    )


def lerp(x, y, a):
    return x * (1.0 - a) + y * a


def cantor_pairing(x, y):
    """Cantor pairing of two non-negative ints (ref math.rs:256-258).

    Computed in uint64 to match the Rust usize arithmetic (wrapping is fine —
    it only seeds a scramble).
    """
    x = jnp.asarray(x, jnp.uint64)
    y = jnp.asarray(y, jnp.uint64)
    s = x + y
    return (s * (s + jnp.uint64(1))) // jnp.uint64(2) + y


def round_up_pow2(v: int) -> int:
    """Host-side: smallest power of two >= v."""
    v = int(v)
    if v <= 1:
        return 1
    return 1 << (v - 1).bit_length()


def log2_int(i: int) -> int:
    return int(i).bit_length() - 1


def max_dimension(v):
    """Index of the largest component of (...,3) arrays (ref math.rs:12-26)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.where(x > y, jnp.where(x > z, 0, 2), jnp.where(y > z, 1, 2))


def luminance(rgb):
    """CIE Y of linear RGB (ref spectrum.rs y())."""
    w = jnp.asarray([0.212671, 0.715160, 0.072169], rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)
