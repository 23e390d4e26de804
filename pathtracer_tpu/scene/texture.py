"""Texture pool: mip pyramids packed into one flat device buffer.

Parity with reference ``src/pathtracer/texture.rs``: non-pow2 Lanczos
resampling (:199-236,286-358), box-filter pyramid (:369-395), Repeat/
Black/Clamp wrap modes (:245-273), trilinear ``lookup_width`` by filter
width (:413-464). The reference allocates one MIPMap object per texture;
here every level of every texture is concatenated into a single
(total_texels, 3) device array addressed through per-texture level tables,
so a whole wavefront's lookups are plain gathers.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import round_up_pow2, log2_int

WRAP_REPEAT = 0
WRAP_BLACK = 1
WRAP_CLAMP = 2

MAX_LEVELS = 16  # up to 32k textures


def _lanczos(x: np.ndarray, tau: float = 2.0) -> np.ndarray:
    x = np.abs(x)
    out = np.zeros_like(x)
    small = x < 1e-5
    inside = (x <= 1.0) & ~small
    xp = np.pi * x[inside]
    out[inside] = (np.sin(xp * tau) / (xp * tau)) * (np.sin(xp) / xp)
    out[small] = 1.0
    return out


def _resample_axis(img: np.ndarray, new_res: int, wrap: int) -> np.ndarray:
    """Lanczos resample along axis 0 (ref texture.rs:213-236,304-351)."""
    old_res = img.shape[0]
    i = np.arange(new_res)
    center = (i + 0.5) * old_res / new_res
    first = np.floor(center - 2.0 + 0.5).astype(np.int64)
    offs = np.arange(4)
    pos = first[:, None] + offs[None, :] + 0.5
    w = _lanczos((pos - center[:, None]) / 2.0)
    w /= w.sum(axis=1, keepdims=True)
    idx = first[:, None] + offs[None, :]
    if wrap == WRAP_REPEAT:
        idx = np.mod(idx, old_res)
    elif wrap == WRAP_CLAMP:
        idx = np.clip(idx, 0, old_res - 1)
    else:
        w = np.where((idx < 0) | (idx >= old_res), 0.0, w)
        idx = np.clip(idx, 0, old_res - 1)
    return np.einsum("nk,nk...->n...", w, img[idx])


def build_pyramid(image: np.ndarray, wrap: int = WRAP_REPEAT) -> list[np.ndarray]:
    """Pow2-resampled mip chain down to 1x1 (ref MIPMap::new)."""
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    h, w = img.shape[:2]
    ph, pw = round_up_pow2(h), round_up_pow2(w)
    if (ph, pw) != (h, w):
        img = _resample_axis(img, ph, wrap)
        img = np.swapaxes(_resample_axis(np.swapaxes(img, 0, 1), pw, wrap),
                          0, 1)
    levels = [img.astype(np.float32)]
    n_levels = 1 + log2_int(max(ph, pw))
    for _ in range(1, n_levels):
        prev = levels[-1]
        hh = max(1, prev.shape[0] // 2)
        ww = max(1, prev.shape[1] // 2)
        ys = np.minimum(2 * np.arange(hh), prev.shape[0] - 1)
        ys1 = np.minimum(2 * np.arange(hh) + 1, prev.shape[0] - 1)
        xs = np.minimum(2 * np.arange(ww), prev.shape[1] - 1)
        xs1 = np.minimum(2 * np.arange(ww) + 1, prev.shape[1] - 1)
        lvl = 0.25 * (prev[ys][:, xs] + prev[ys1][:, xs]
                      + prev[ys][:, xs1] + prev[ys1][:, xs1])
        levels.append(lvl.astype(np.float32))
    return levels


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TexturePool:
    """Device-side packed texture pool."""

    data: Any  # (total, 3) f32
    level_offset: Any  # (T, MAX_LEVELS) i32
    level_w: Any  # (T, MAX_LEVELS) i32
    level_h: Any  # (T, MAX_LEVELS) i32
    n_levels: Any  # (T,) i32
    wrap: Any  # (T,) i32


class TexturePoolBuilder:
    def __init__(self) -> None:
        self.chunks: list[np.ndarray] = []
        self.offsets: list[list[int]] = []
        self.widths: list[list[int]] = []
        self.heights: list[list[int]] = []
        self.wraps: list[int] = []
        self.total = 0

    def add(self, image: np.ndarray, wrap: int = WRAP_REPEAT) -> int:
        levels = build_pyramid(image, wrap)
        offs, ws, hs = [], [], []
        for lvl in levels[:MAX_LEVELS]:
            offs.append(self.total)
            hs.append(lvl.shape[0])
            ws.append(lvl.shape[1])
            self.chunks.append(lvl.reshape(-1, 3))
            self.total += lvl.shape[0] * lvl.shape[1]
        pad = MAX_LEVELS - len(offs)
        self.offsets.append(offs + [offs[-1]] * pad)
        self.widths.append(ws + [ws[-1]] * pad)
        self.heights.append(hs + [hs[-1]] * pad)
        self.wraps.append(wrap)
        return len(self.wraps) - 1

    def build(self) -> TexturePool:
        if not self.chunks:
            data = np.zeros((1, 3), np.float32)
            # host numpy; TracedScene.create pushes to device once
            return TexturePool(
                data=data,
                level_offset=np.zeros((1, MAX_LEVELS), np.int32),
                level_w=np.ones((1, MAX_LEVELS), np.int32),
                level_h=np.ones((1, MAX_LEVELS), np.int32),
                n_levels=np.ones((1,), np.int32),
                wrap=np.zeros((1,), np.int32),
            )
        return TexturePool(
            data=np.concatenate(self.chunks),
            level_offset=np.asarray(self.offsets, np.int32),
            level_w=np.asarray(self.widths, np.int32),
            level_h=np.asarray(self.heights, np.int32),
            n_levels=np.asarray([min(len(o), MAX_LEVELS)
                                 for o in self.offsets], np.int32),
            wrap=np.asarray(self.wraps, np.int32),
        )


def _texel(pool: TexturePool, tex, level, s, t):
    """Wrapped texel fetch; tex/level/s/t all (N,) arrays."""
    w = pool.level_w[tex, level]
    h = pool.level_h[tex, level]
    wrap = pool.wrap[tex]
    s_rep = jnp.mod(s, w)
    t_rep = jnp.mod(t, h)
    s_cl = jnp.clip(s, 0, w - 1)
    t_cl = jnp.clip(t, 0, h - 1)
    outside = (s < 0) | (s >= w) | (t < 0) | (t >= h)
    si = jnp.select([wrap == WRAP_REPEAT, wrap == WRAP_CLAMP], [s_rep, s_cl],
                    s_cl)
    ti = jnp.select([wrap == WRAP_REPEAT, wrap == WRAP_CLAMP], [t_rep, t_cl],
                    t_cl)
    val = pool.data[pool.level_offset[tex, level] + ti * w + si]
    black = (wrap == WRAP_BLACK) & outside
    return jnp.where(black[..., None], 0.0, val)


def _triangle(pool: TexturePool, tex, level, st):
    """Bilinear lookup at one mip level (ref texture.rs:413-428)."""
    level = jnp.clip(level, 0, pool.n_levels[tex] - 1)
    w = pool.level_w[tex, level].astype(jnp.float32)
    h = pool.level_h[tex, level].astype(jnp.float32)
    s = st[..., 0] * w - 0.5
    t = st[..., 1] * h - 0.5
    s0 = jnp.floor(s)
    t0 = jnp.floor(t)
    ds = (s - s0)[..., None]
    dt = (t - t0)[..., None]
    s0 = s0.astype(jnp.int32)
    t0 = t0.astype(jnp.int32)
    return (_texel(pool, tex, level, s0, t0) * (1 - ds) * (1 - dt)
            + _texel(pool, tex, level, s0, t0 + 1) * (1 - ds) * dt
            + _texel(pool, tex, level, s0 + 1, t0) * ds * (1 - dt)
            + _texel(pool, tex, level, s0 + 1, t0 + 1) * ds * dt)


def lookup_width(pool: TexturePool, tex, st, width):
    """Trilinear mip lookup (ref texture.rs:447-464).

    tex: (N,) texture ids; st: (N, 2); width: (N,) or scalar filter width.
    """
    if isinstance(width, (int, float)) and float(width) == 0.0:
        # statically width-0 (rays without differentials, i.e. every
        # non-camera bounce — the reference's deeper rays carry none
        # either, texture.rs:430-445): level-0 bilinear, which skips the
        # second mip level's 4 texel gathers (the hot path is gather-rate
        # bound; this halves per-bounce texture cost)
        return _triangle(pool, tex, jnp.zeros(st.shape[:-1], jnp.int32), st)
    n_lev = pool.n_levels[tex].astype(jnp.float32)
    width = jnp.broadcast_to(jnp.asarray(width, jnp.float32), st.shape[:-1])
    level = n_lev - 1.0 + jnp.log2(jnp.maximum(width, 1e-8))
    lo = jnp.floor(jnp.clip(level, 0.0, n_lev - 1.0)).astype(jnp.int32)
    delta = jnp.clip(level - lo.astype(jnp.float32), 0.0, 1.0)[..., None]
    v0 = _triangle(pool, tex, lo, st)
    v1 = _triangle(pool, tex, lo + 1, st)
    return v0 * (1 - delta) + v1 * delta
