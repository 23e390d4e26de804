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
    """Padded film accumulator: origin shifted by FILM_PAD on each side.

    Out-of-film splat targets land in the border and are cropped at the end
    (matches the reference dropping off-film tile pixels at merge,
    film.rs:193-211 intersect with pixel_bounds). ``extra_rows`` leaves
    room for the last row band's zero-weight padding rows.
    """
    return jnp.zeros((height + 2 * FILM_PAD + extra_rows,
                      width + 2 * FILM_PAD, 4), jnp.float32)


def film_crop(film_pad: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    return film_pad[FILM_PAD:FILM_PAD + height, FILM_PAD:FILM_PAD + width]


def splat_tile(radiance, jx, jy, valid, filter_table, radius: float = 2.0):
    """Dense tile splat: one sample per pixel of a (Th, Tw) band.

    radiance: (Th, Tw, 3); jx, jy: (Th, Tw) jitters in [0,1); valid: (Th,
    Tw) bool. Returns a (Th+4, Tw+4, 4) tile: 25 shifted dense adds replace
    the reference's per-sample scatter loop (film.rs:60-106) — same filter
    weights (16-entry table, floor-indexed), no scatter hardware needed.
    """
    th, tw = radiance.shape[:2]
    f32 = jnp.float32
    tile = jnp.zeros((th + 4, tw + 4, 4), f32)
    inv_r = 1.0 / radius
    table = filter_table  # (16, 16)

    # per-axis offsets from the discrete sample position: x - pd = dx-jx+0.5
    offs = []
    for dx in range(-2, 3):
        off = dx - jx + 0.5
        fi = jnp.minimum(
            jnp.floor(jnp.abs(off) * inv_r * FILTER_TABLE_WIDTH).astype(jnp.int32),
            FILTER_TABLE_WIDTH - 1)
        offs.append((off, fi))
    offs_y = []
    for dy in range(-2, 3):
        off = dy - jy + 0.5
        fi = jnp.minimum(
            jnp.floor(jnp.abs(off) * inv_r * FILTER_TABLE_WIDTH).astype(jnp.int32),
            FILTER_TABLE_WIDTH - 1)
        offs_y.append((off, fi))

    l_ok = jnp.where(valid[..., None], radiance, 0.0)
    for iy, (offy, fiy) in enumerate(offs_y):
        wy_ok = (jnp.abs(offy) <= radius) & valid
        for ix, (offx, fix) in enumerate(offs):
            w = table[fiy, fix]  # (Th, Tw) gather from 256-entry table
            ok = wy_ok & (jnp.abs(offx) <= radius)
            w = jnp.where(ok, w, 0.0)
            update = jnp.concatenate([l_ok * w[..., None], w[..., None]],
                                     axis=-1)
            tile = jax.lax.dynamic_update_slice(
                tile,
                jax.lax.dynamic_slice(tile, (iy, ix, 0), (th, tw, 4)) + update,
                (iy, ix, 0))
    return tile


def film_pad_accumulate(film_pad, tile, band_x0: int, band_y0: int):
    """Add a (Th+4, Tw+4, 4) band tile into the padded film.

    band_x0/band_y0: raster coords of the band's first pixel (may be
    negative by the filter radius)."""
    y = band_y0 - 2 + FILM_PAD
    x = band_x0 - 2 + FILM_PAD
    th, tw = tile.shape[0], tile.shape[1]
    cur = jax.lax.dynamic_slice(film_pad, (y, x, 0), (th, tw, 4))
    return jax.lax.dynamic_update_slice(film_pad, cur + tile, (y, x, 0))


def to_rgb(film):
    """Normalize the accumulator to linear RGB (H, W, 3)."""
    inv_w = 1.0 / jnp.maximum(film[..., 3:4], 1e-20)
    return film[..., :3] * inv_w


def to_rgb8(film) -> np.ndarray:
    """sRGB 8-bit image (ref spectrum.rs to_image_rgba:95-102)."""
    rgb = to_rgb(film)
    srgb = jnp.clip(gamma_correct(rgb) * 255.0 + 0.5, 0.0, 255.0)
    return np.asarray(srgb).astype(np.uint8)
