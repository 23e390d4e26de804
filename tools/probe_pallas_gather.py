"""Probe: which per-lane gather idioms does Mosaic support on this TPU?

A Pallas BVH traversal only pays off if each lane can fetch ITS OWN node
row from a VMEM-resident table. Round 1 found `tri_ref[i]` row loads with
a dynamic scalar index fault Mosaic; this probes every idiom available in
jax 0.9 so the traversal design can build on whichever works:

  a. jnp.take(table, idx, axis=0)            — general gather
  b. table[idx]                              — getitem gather
  c. jax.lax.gather via take_along_axis      — lane-dim gather (128-wide)
  d. one_hot @ table                         — MXU matmul gather (128 rows)
  e. fori_loop over scalar dynamic rows      — the round-1 faulting idiom

Each case compiles and runs in its own try/except; prints OK/FAIL + ms.

Usage: python tools/probe_pallas_gather.py
"""

import os
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

M, W = 65536, 8        # node-table shape (rows, row width)
N = 8192               # lanes doing independent gathers

rng = np.random.default_rng(0)
table = jnp.asarray(rng.random((M, W), np.float32))
idx = jnp.asarray(rng.integers(0, M, N).astype(np.int32))


def timed(name, fn, *args):
    try:
        out = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        ref = np.asarray(table)[np.asarray(idx)]
        got = np.asarray(out)[:N]
        ok = np.allclose(got, ref)
        print(f"{name}: {'OK' if ok else 'WRONG RESULT'}  {dt*1e3:.3f} ms",
              flush=True)
    except Exception:
        err = traceback.format_exc().strip().splitlines()
        print(f"{name}: FAIL ({err[-1][:140]})", flush=True)


# --- XLA baseline
timed("xla  table[idx]", jax.jit(lambda t, i: t[i]), table, idx)


# --- a. jnp.take inside pallas
def k_take(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)


timed("pl a jnp.take      ", jax.jit(lambda t, i: pl.pallas_call(
    k_take,
    out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i)), table, idx)


# --- b. getitem gather
def k_getitem(t_ref, i_ref, o_ref):
    o_ref[:] = t_ref[:][i_ref[:]]


timed("pl b table[idx]    ", jax.jit(lambda t, i: pl.pallas_call(
    k_getitem,
    out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i)), table, idx)


# --- c. take_along_axis over the LANE dim: table transposed to (W, M),
# gather along axis=1 with per-lane indices broadcast to (W, N)
def k_lane(t_ref, i_ref, o_ref):
    idx2 = jnp.broadcast_to(i_ref[:].reshape(1, N), (W, N))
    o_ref[:] = jnp.take_along_axis(t_ref[:], idx2, axis=1)


tableT = jnp.asarray(np.asarray(table).T.copy())
timed("pl c lane-dim gathr", jax.jit(lambda t, i: pl.pallas_call(
    k_lane,
    out_shape=jax.ShapeDtypeStruct((W, N), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i).T), tableT, idx)


# --- e. fori_loop scalar dynamic row loads (round-1 faulting idiom)
def k_scalar(t_ref, i_ref, o_ref):
    def body(k, _):
        o_ref[k, :] = t_ref[i_ref[k, 0], :]
        return 0
    jax.lax.fori_loop(0, N, body, 0)


timed("pl e scalar rows   ", jax.jit(lambda t, i: pl.pallas_call(
    k_scalar,
    out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
        t, i.reshape(N, 1))), table, idx)


# --- f. per-lane SUBLANE scatter (a traversal stack push): for each lane
# l, write v[l] into stack[sp[l], l] on a (64, N) scratch, then read back
# via take_along_axis. Exercises both the scatter and gather the
# stack-based kernel needs.
D = 64


def k_stack(sp_ref, v_ref, o_ref):
    def body(stack):
        sp = sp_ref[:].reshape(1, N)
        rows = jax.lax.broadcasted_iota(jnp.int32, (D, N), 0)
        push = rows == sp  # one-hot along sublanes
        stack[:] = jnp.where(push, v_ref[:].reshape(1, N), stack[:])
        o_ref[:] = jnp.take_along_axis(stack[:], sp, axis=0)[0]

    pl.run_scoped(body, pltpu.VMEM((D, N), jnp.float32))


def run_stack(sp, v):
    return pl.pallas_call(
        k_stack,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(sp, v)


try:
    sp = jnp.asarray(rng.integers(0, D, N).astype(np.int32))
    v = jnp.asarray(rng.random(N).astype(np.float32))
    out = jax.block_until_ready(jax.jit(run_stack)(sp, v))
    ok = np.allclose(np.asarray(out), np.asarray(v))
    t0 = time.perf_counter()
    for _ in range(10):
        out = jax.jit(run_stack)(sp, v)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"pl f stack push/pop: {'OK' if ok else 'WRONG RESULT'}  "
          f"{dt*1e3:.3f} ms", flush=True)
except Exception:
    err = traceback.format_exc().strip().splitlines()
    print(f"pl f stack push/pop: FAIL ({err[-1][:140]})", flush=True)
