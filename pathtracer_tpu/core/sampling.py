"""Sampling warps and piecewise-constant distributions.

Parity with reference ``src/pathtracer/sampling.rs``: hemisphere/disk warps
(:84-126), Distribution1D (:128-183) and Distribution2D (:185-230) rebuilt as
cumsum CDF tables sampled on device with ``searchsorted`` — the TPU-native
replacement for the per-call binary search.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .math import ONE_MINUS_EPSILON


def uniform_sample_hemisphere(u):
    """(..., 2) → (..., 3) unit vectors, z >= 0 (ref sampling.rs:84-89)."""
    z = u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * np.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_hemisphere_pdf():
    return np.float32(0.5 / np.pi)


def uniform_sample_sphere(u):
    """(..., 2) → (..., 3) unit vectors over the full sphere, pdf =
    1/(4π). The reference has no sphere warp because the only consumer
    (PointLight::sample_le, light.rs:131) is ``todo!`` there; ours backs
    the implemented emission-sampling API (ops/lights.sample_le)."""
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * np.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sphere_pdf():
    return np.float32(0.25 / np.pi)


def concentric_sample_disk(u):
    """(..., 2) → (..., 2) points in the unit disk (ref sampling.rs:96-116)."""
    u_off = 2.0 * u - 1.0
    x, y = u_off[..., 0], u_off[..., 1]
    zero = (x == 0.0) & (y == 0.0)
    x_major = jnp.abs(x) > jnp.abs(y)
    # guard divisions; selected branch always has nonzero denominator
    safe_x = jnp.where(x == 0.0, 1.0, x)
    safe_y = jnp.where(y == 0.0, 1.0, y)
    r = jnp.where(x_major, x, y)
    theta = jnp.where(
        x_major,
        (np.pi / 4.0) * (y / safe_x),
        (np.pi / 2.0) - (np.pi / 4.0) * (x / safe_y),
    )
    p = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return jnp.where(zero[..., None], 0.0, p)


def cosine_sample_hemisphere(u):
    """(..., 2) → (..., 3), pdf = cosθ/π (ref sampling.rs:118-122)."""
    d = concentric_sample_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.stack([d[..., 0], d[..., 1], z], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * np.float32(1.0 / np.pi)


def uniform_sample_triangle(u):
    """(..., 2) → barycentric (b0, b1) (ref shape.rs:14-17)."""
    su0 = jnp.sqrt(u[..., 0])
    return jnp.stack([1.0 - su0, u[..., 1] * su0], axis=-1)


@dataclasses.dataclass
class Distribution1D:
    """Piecewise-constant 1D distribution as device arrays.

    func: (n,), cdf: (n+1,), func_int: scalar. Ref sampling.rs:128-183.
    """

    func: jnp.ndarray
    cdf: jnp.ndarray
    func_int: jnp.ndarray

    @staticmethod
    def build(f: np.ndarray) -> "Distribution1D":
        f = np.asarray(f, np.float32)
        n = f.shape[-1]
        cdf = np.concatenate(
            [np.zeros(f.shape[:-1] + (1,), np.float32), np.cumsum(f / n, axis=-1)],
            axis=-1,
        ).astype(np.float32)
        func_int = cdf[..., -1].copy()
        uniform = (np.arange(n + 1, dtype=np.float32) / n)
        zero = func_int == 0.0
        safe = np.where(zero, 1.0, func_int)
        cdf = np.where(zero[..., None], uniform, cdf / safe[..., None])
        return Distribution1D(jnp.asarray(f), jnp.asarray(cdf), jnp.asarray(func_int))


def sample_distribution_1d(func, cdf, func_int, u):
    """Vectorized sample_continuous (ref sampling.rs:164-182).

    Returns (x in [0,1), pdf, offset). func (n,), cdf (n+1,), u (...,).
    """
    n = func.shape[-1]
    offset = jnp.clip(jnp.searchsorted(cdf, u, side="right") - 1, 0, n - 1)
    c0 = cdf[offset]
    c1 = cdf[offset + 1]
    denom = c1 - c0
    du = jnp.where(denom > 0.0, (u - c0) / jnp.where(denom > 0.0, denom, 1.0), u - c0)
    pdf = jnp.where(func_int > 0.0, func[offset] / jnp.maximum(func_int, 1e-30), 0.0)
    return (offset.astype(jnp.float32) + du) / n, pdf, offset


@dataclasses.dataclass
class Distribution2D:
    """2D distribution: per-row conditionals + marginal (ref sampling.rs:185-230).

    cond_func: (nv, nu), cond_cdf: (nv, nu+1), cond_int: (nv,),
    marg_func: (nv,), marg_cdf: (nv+1,), marg_int: scalar.
    """

    cond_func: jnp.ndarray
    cond_cdf: jnp.ndarray
    cond_int: jnp.ndarray
    marg_func: jnp.ndarray
    marg_cdf: jnp.ndarray
    marg_int: jnp.ndarray

    @staticmethod
    def build(func: np.ndarray) -> "Distribution2D":
        func = np.asarray(func, np.float32)  # (nv, nu)
        nv, nu = func.shape
        cond = Distribution1D.build(func)  # batched over rows
        marg = Distribution1D.build(np.asarray(cond.func_int))
        return Distribution2D(
            cond_func=cond.func, cond_cdf=cond.cdf, cond_int=cond.func_int,
            marg_func=marg.func, marg_cdf=marg.cdf, marg_int=marg.func_int,
        )

    def sample(self, u):
        """u: (..., 2) → (uv (..., 2), pdf (...,))."""
        d1, pdf1, v = sample_distribution_1d(
            self.marg_func, self.marg_cdf, self.marg_int, u[..., 1])
        nu = self.cond_func.shape[-1]
        cdf_v = self.cond_cdf[v]  # (..., nu+1)
        func_v = self.cond_func[v]
        int_v = self.cond_int[v]
        off = jnp.clip(
            jax_searchsorted_batched(cdf_v, u[..., 0]), 0, nu - 1)
        c0 = jnp.take_along_axis(cdf_v, off[..., None], axis=-1)[..., 0]
        c1 = jnp.take_along_axis(cdf_v, off[..., None] + 1, axis=-1)[..., 0]
        denom = c1 - c0
        du = jnp.where(denom > 0.0,
                       (u[..., 0] - c0) / jnp.where(denom > 0.0, denom, 1.0),
                       u[..., 0] - c0)
        f = jnp.take_along_axis(func_v, off[..., None], axis=-1)[..., 0]
        pdf0 = jnp.where(int_v > 0.0, f / jnp.maximum(int_v, 1e-30), 0.0)
        d0 = (off.astype(jnp.float32) + du) / nu
        return jnp.stack([d0, d1], axis=-1), pdf0 * pdf1

    def pdf(self, p):
        """Density at (..., 2) uv (ref sampling.rs:223-229)."""
        nv, nu = self.cond_func.shape
        iu = jnp.clip((p[..., 0] * nu).astype(jnp.int32), 0, nu - 1)
        iv = jnp.clip((p[..., 1] * nv).astype(jnp.int32), 0, nv - 1)
        return self.cond_func[iv, iu] / jnp.maximum(self.marg_int, 1e-30)


def jax_searchsorted_batched(cdf_rows, u):
    """Row-wise searchsorted: cdf_rows (..., n+1), u (...,) → 'right'-1."""
    return jnp.sum((cdf_rows <= u[..., None]).astype(jnp.int32), axis=-1) - 1
