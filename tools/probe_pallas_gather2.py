"""Probe round 2: full errors + decomposed gather idioms for Mosaic.

Round 1 (probe_pallas_gather.py): XLA gather fast; Pallas scalar-row loop
WORKS (jax 0.9 fixed the round-1 fault) but serializes; vector gathers
a/b/c and the one-hot stack all failed with hidden errors. Here:
  g. sublane-dim take_along_axis: data (C, 128), idx (S, 128) axis=0
  h. lane shuffle within 128: data (S, 128), idx (S, 128) axis=1
  i. two-step general gather = g (chunk select) then h (lane rotate)
  j. MXU one-hot gather for a 128-row table block
plus full error text (JAX_TRACEBACK_FILTERING=off) for whatever fails.

Usage: python tools/probe_pallas_gather2.py
"""

import os

os.environ["JAX_TRACEBACK_FILTERING"] = "off"

import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

rng = np.random.default_rng(0)


def timed(name, fn, ref, *args):
    try:
        out = jax.block_until_ready(jax.jit(fn)(*args))
        t0 = time.perf_counter()
        for _ in range(20):
            out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 20
        ok = np.allclose(np.asarray(out), ref)
        print(f"{name}: {'OK' if ok else 'WRONG'}  {dt*1e3:.3f} ms",
              flush=True)
    except Exception:
        lines = traceback.format_exc().strip().splitlines()
        keep = [ln for ln in lines if ln and not ln.startswith(" ")][-4:]
        print(f"{name}: FAIL", flush=True)
        for ln in keep:
            print(f"    | {ln[:160]}", flush=True)


# ---------------- g. sublane-dim gather: out[s,l] = data[idx[s,l], l]
C, S = 548, 64  # chunk count (70k/128), lanes-rows of indices
data_g = jnp.asarray(rng.random((C, 128), np.float32))
idx_g = jnp.asarray(rng.integers(0, C, (S, 128)).astype(np.int32))
ref_g = np.take_along_axis(np.asarray(data_g), np.asarray(idx_g), axis=0)


def k_sub(d_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(d_ref[:], i_ref[:], axis=0)


timed("g sublane gather (548,128)", lambda d, i: pl.pallas_call(
    k_sub,
    out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(d, i), ref_g,
    data_g, idx_g)


# ---------------- h. lane shuffle: out[s,l] = data[s, idx[s,l]]
data_h = jnp.asarray(rng.random((S, 128), np.float32))
idx_h = jnp.asarray(rng.integers(0, 128, (S, 128)).astype(np.int32))
ref_h = np.take_along_axis(np.asarray(data_h), np.asarray(idx_h), axis=1)


def k_lane(d_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(d_ref[:], i_ref[:], axis=1)


timed("h lane shuffle   (64,128) ", lambda d, i: pl.pallas_call(
    k_lane,
    out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(d, i), ref_h,
    data_h, idx_h)


# ---------------- i. general per-lane gather from a flat (M,) table via
# two-step: sublane chunk select then lane rotate. out[s,l] = flat[idx[s,l]]
M = C * 128
flat = jnp.asarray(rng.random(M, np.float32))
idx_i = jnp.asarray(rng.integers(0, M, (S, 128)).astype(np.int32))
ref_i = np.asarray(flat)[np.asarray(idx_i)]


def k_two(d_ref, i_ref, o_ref):
    idx = i_ref[:]
    chunk = idx >> 7          # (S,128) chunk row per target
    lanepos = idx & 127       # target lane within the chunk row
    # step 1: bring the right chunk row into each (s, l) slot — but the
    # value each lane wants lives at lane `lanepos`, so first rotate the
    # INDEX pattern: gather column lanepos via lane shuffle AFTER pulling
    # rows. Pull rows with lane-position = final lane: we need
    # flat2[chunk[s,l], lanepos[s,l]]; do it as compose of the two
    # supported ops: tmp[s,l] = flat2[chunk[s, shuffle], l] ... a clean
    # decomposition needs the chunk pattern aligned with the target lane,
    # so gather chunk rows with the index each lane ultimately reads:
    t1 = jnp.take_along_axis(d_ref[:], chunk, axis=0)    # rows selected
    # t1[s,l] = flat2[chunk[s,l], l]; now lane-shuffle needs per-lane
    # source lane = lanepos, but applied to a row where OTHER lanes
    # selected different chunks. Only correct when all lanes in a row
    # share one chunk — the general case needs tmp[s,l'] for l'=lanepos,
    # i.e. chunk gathered at lane l' too: gather chunk' = chunk shuffled
    # by lanepos first (self-referential). Resolve with a second row
    # gather using a lane-shuffled chunk pattern:
    chunk_at_src = jnp.take_along_axis(chunk, lanepos, axis=1)
    t2 = jnp.take_along_axis(d_ref[:], chunk_at_src, axis=0)
    o_ref[:] = jnp.take_along_axis(t2, lanepos, axis=1)


flat2 = flat.reshape(C, 128)
timed("i two-step flat gather    ", lambda d, i: pl.pallas_call(
    k_two,
    out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(d, i), ref_i,
    flat2, idx_i)


# ---------------- j. MXU one-hot gather: table block (128, 8pad128),
# idx (S,128) restricted to 0..127; out[s,l,:] impractical — probe the
# throughput shape (S*128, 128) = onehot @ table
tbl_j = jnp.asarray(rng.random((128, 128), np.float32))
idx_j = jnp.asarray(rng.integers(0, 128, (S, 128)).astype(np.int32))
ref_j = np.asarray(tbl_j)[np.asarray(idx_j).ravel()].reshape(S, 128, 128)


def k_mxu(t_ref, i_ref, o_ref):
    idx = i_ref[:].reshape(S * 128, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S * 128, 128), 1)
    onehot = (cols == idx).astype(jnp.float32)
    o_ref[:] = jnp.dot(onehot, t_ref[:],
                       preferred_element_type=jnp.float32
                       ).reshape(S, 128, 128)


timed("j mxu one-hot 8k rows     ", lambda t, i: pl.pallas_call(
    k_mxu,
    out_shape=jax.ShapeDtypeStruct((S, 128, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i), ref_j,
    tbl_j, idx_j)

print("probe2 done", flush=True)
