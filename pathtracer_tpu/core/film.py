"""TPU film: additive (contrib·w, Σw) accumulator with filter-splat scatter.

Parity with reference ``src/common/film.rs``: ``FilmTile::add_sample``
(:60-106) splats each radiance sample into every pixel within the filter
radius using the 16x16 filter table; ``to_rgba_image`` (:230-251) normalizes
by the weight sum and sRGB-encodes. Here the film is a single (H, W, 4)
device array [r·w, g·w, b·w, Σw] and the splat is one masked scatter-add over
the static 5x5 (radius-2) footprint — associative, so tiles/chips merge by
plain addition (psum across a mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .filter import FILTER_TABLE_WIDTH
from .math import gamma_correct


def film_new(width: int, height: int) -> jnp.ndarray:
    return jnp.zeros((height, width, 4), jnp.float32)


def sample_bounds(width: int, height: int, radius: float = 2.0):
    """Raster-space sample rectangle, expanded by the filter radius.

    Ref film.rs:174-185: p_min = floor(0.5 - r), p_max = ceil(res - 0.5 + r).
    """
    p_min = int(np.floor(0.5 - radius))
    p_max_x = int(np.ceil(width - 0.5 + radius))
    p_max_y = int(np.ceil(height - 0.5 + radius))
    return (p_min, p_min), (p_max_x, p_max_y)


def add_samples(film, p_film, radiance, filter_table, radius: float = 2.0,
                footprint: int = 5):
    """Splat a batch of samples into the film.

    film: (H, W, 4); p_film: (N, 2) raster positions; radiance: (N, 3).
    Ref film.rs:60-106 semantics: discrete position pd = p_film - 0.5; pixels
    x in [ceil(pd-r), floor(pd+r)]; per-axis filter-table index
    floor(|x - pd| / r * 16) clamped to 15.
    """
    h, w, _ = film.shape
    pd = p_film - 0.5
    p0 = jnp.ceil(pd - radius).astype(jnp.int32)  # (N,2) inclusive lo
    p1 = (jnp.floor(pd + radius) + 1.0).astype(jnp.int32)  # (N,2) exclusive hi

    offs = jnp.arange(footprint, dtype=jnp.int32)
    # pixel coordinates over the footprint: (N, footprint)
    xs = p0[:, 0:1] + offs[None, :]
    ys = p0[:, 1:2] + offs[None, :]
    inv_r = 1.0 / radius
    fx = jnp.abs((xs.astype(jnp.float32) - pd[:, 0:1]) * inv_r * FILTER_TABLE_WIDTH)
    fy = jnp.abs((ys.astype(jnp.float32) - pd[:, 1:2]) * inv_r * FILTER_TABLE_WIDTH)
    ifx = jnp.minimum(jnp.floor(fx).astype(jnp.int32), FILTER_TABLE_WIDTH - 1)
    ify = jnp.minimum(jnp.floor(fy).astype(jnp.int32), FILTER_TABLE_WIDTH - 1)

    valid_x = (xs < p1[:, 0:1]) & (xs >= 0) & (xs < w)  # (N,F)
    valid_y = (ys < p1[:, 1:2]) & (ys >= 0) & (ys < h)

    # (N, Fy, Fx) weights and masks
    table = filter_table.reshape(-1)
    wgt = table[(ify[:, :, None] * FILTER_TABLE_WIDTH + ifx[:, None, :]).reshape(-1)]
    wgt = wgt.reshape(ify.shape[0], footprint, footprint)
    mask = (valid_y[:, :, None] & valid_x[:, None, :]).astype(jnp.float32)
    wgt = wgt * mask

    contrib = radiance[:, None, None, :] * wgt[..., None]  # (N,Fy,Fx,3)
    update = jnp.concatenate([contrib, wgt[..., None]], axis=-1)  # (N,Fy,Fx,4)

    yi = jnp.clip(ys, 0, h - 1)[:, :, None]  # (N,Fy,1)
    xi = jnp.clip(xs, 0, w - 1)[:, None, :]  # (N,1,Fx)
    flat_idx = (yi * w + xi).reshape(-1)  # (N*Fy*Fx,)
    film_flat = film.reshape(h * w, 4)
    film_flat = film_flat.at[flat_idx].add(
        update.reshape(-1, 4), mode="drop", indices_are_sorted=False
    )
    return film_flat.reshape(h, w, 4)


FILM_PAD = 4  # padded border: filter radius 2 (sample bounds) + 2 (splat)


def film_pad_new(width: int, height: int, extra_rows: int = 0) -> jnp.ndarray:
    """Padded film accumulator, channel-first (4, H+pad, W+pad).

    Channel-first keeps the wide W axis in the TPU lane dimension (a
    trailing size-4 channel axis would pad every lane tile 32x). Out-of-film
    splat targets land in the border and are cropped at the end (matches the
    reference dropping off-film tile pixels at merge, film.rs:193-211).
    ``extra_rows`` leaves room for the last row band's zero-weight padding.
    """
    return jnp.zeros((4, height + 2 * FILM_PAD + extra_rows,
                      width + 2 * FILM_PAD), jnp.float32)


def film_crop(film_pad: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """(4, Hp, Wp) padded accumulator → (H, W, 4) public film layout."""
    return jnp.transpose(
        film_pad[:, FILM_PAD:FILM_PAD + height, FILM_PAD:FILM_PAD + width],
        (1, 2, 0))


def _filter_1d_lookup(fi, f1d):
    """Piecewise-constant filter value by 16-way select (no gather)."""
    w = jnp.zeros_like(fi, jnp.float32)
    for k in range(FILTER_TABLE_WIDTH):
        w = jnp.where(fi == k, np.float32(f1d[k]), w)
    return w


def splat_halfwidth(radius: float) -> int:
    """Integer half-width of the splat footprint for a filter radius.

    A sample at discrete position pd = px + j - 0.5 (j in [0,1)) reaches
    pixel px+dx iff |dx + 0.5 - j| <= radius, i.e. dx in
    [-floor(r+0.5), floor(r+0.5)] (extra taps get zero weight)."""
    return int(np.floor(radius + 0.5))


def splat_tile(radiance, jx, jy, valid, filter_f1d, radius: float = 2.0):
    """Dense tile splat: one sample per pixel of a (Th, Tw) band.

    radiance: (Th, Tw, 3); jx, jy: (Th, Tw) jitters in [0,1); valid:
    (Th, Tw) bool; filter_f1d: host (16,) separable filter row (the 2D
    table is its outer product); radius: the actual filter radius (static)
    — it sets both the footprint size and the table-index scale.
    Returns a (4, Th+2h, Tw+2h) channel-first tile, h = splat_halfwidth:
    (2h+1)^2 statically-shifted dense adds replace the reference's
    per-sample scatter loop (film.rs:60-106) with identical weights.
    """
    th, tw = radiance.shape[:2]
    f32 = jnp.float32
    half = splat_halfwidth(radius)
    pad = 2 * half
    fp = 2 * half + 1
    tile = jnp.zeros((4, th + pad, tw + pad), f32)
    inv_r = 1.0 / radius

    def axis_weights(j, d):
        off = d - j + 0.5
        fi = jnp.minimum(
            jnp.floor(jnp.abs(off) * inv_r * FILTER_TABLE_WIDTH)
            .astype(jnp.int32),
            FILTER_TABLE_WIDTH - 1)
        w = _filter_1d_lookup(fi, filter_f1d)
        return jnp.where(jnp.abs(off) <= radius, w, 0.0)

    wx = [axis_weights(jx, dx) for dx in range(-half, half + 1)]
    wy = [axis_weights(jy, dy) for dy in range(-half, half + 1)]

    l_ok = jnp.where(valid[None, ...],
                     jnp.transpose(radiance, (2, 0, 1)), 0.0)  # (3, Th, Tw)
    vmask = valid.astype(f32)
    for iy in range(fp):
        for ix in range(fp):
            w = wy[iy] * wx[ix] * vmask  # (Th, Tw)
            update = jnp.concatenate([l_ok * w[None], w[None]], axis=0)
            # pad+sum beats shifted slice-updates ~2x on TPU (no strided RMW)
            tile = tile + jnp.pad(update,
                                  ((0, 0), (iy, pad - iy), (ix, pad - ix)))
    return tile


def film_pad_accumulate(film_pad, tile, band_x0: int, band_y0: int,
                        half: int = 2):
    """Add a (4, Th+2*half, Tw+2*half) band tile into the padded film.

    band_x0/band_y0: raster coords of the band's first pixel (may be
    negative by the filter radius); half: the splat half-width the tile
    was built with (splat_halfwidth(radius))."""
    y = band_y0 - half + FILM_PAD
    x = band_x0 - half + FILM_PAD
    th, tw = tile.shape[1], tile.shape[2]
    cur = jax.lax.dynamic_slice(film_pad, (0, y, x), (4, th, tw))
    return jax.lax.dynamic_update_slice(film_pad, cur + tile, (0, y, x))


def to_rgb(film):
    """Normalize the accumulator to linear RGB (H, W, 3)."""
    inv_w = 1.0 / jnp.maximum(film[..., 3:4], 1e-20)
    return film[..., :3] * inv_w


def to_rgb8(film) -> np.ndarray:
    """sRGB 8-bit image (ref spectrum.rs to_image_rgba:95-102)."""
    rgb = to_rgb(film)
    srgb = jnp.clip(gamma_correct(rgb) * 255.0 + 0.5, 0.0, 255.0)
    return np.asarray(srgb).astype(np.uint8)
