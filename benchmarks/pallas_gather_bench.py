#!/usr/bin/env python
"""Benchmark Mosaic tpu.dynamic_gather via jnp.take_along_axis inside a
Pallas kernel. Constraint (jax 0.9 lowering): table.shape == idx.shape
== out.shape, 2D, gather along dim 0 (lanes batched) or dim 1
(sublanes batched). So we chunk N rays into chunks of CH == T rows.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.asarray(x).sum())


def bench(fn, *args, reps=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def make_sublane_gather(N, T, W, Wb):
    """out[n] = table[idx[n]] ; chunks of CH=T rows, W split into Wb blocks."""
    assert N % T == 0

    def kernel(idx_ref, table_ref, out_ref):
        ids = jnp.broadcast_to(idx_ref[:], (T, Wb))
        out_ref[:] = jnp.take_along_axis(table_ref[:], ids, axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(N // T, W // Wb),
            in_specs=[
                pl.BlockSpec((T, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, Wb), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, Wb), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
    )


def make_lane_gather(N, T, W):
    """planar: out[c, n] = table[c, idx[n]] ; chunks of CH=T lanes."""
    assert N % T == 0

    def kernel(idx_ref, table_ref, out_ref):
        ids = jnp.broadcast_to(idx_ref[:], (W, T))
        out_ref[:] = jnp.take_along_axis(table_ref[:], ids, axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((W, N), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(N // T,),
            in_specs=[
                pl.BlockSpec((1, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((W, T), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((W, T), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
    )


def main():
    key = jax.random.PRNGKey(0)

    # sublane-dim gather
    for T, W, Wb in ((16384, 112, 16), (16384, 112, 112), (16384, 16, 16),
                     (8192, 128, 128), (1024, 128, 128), (65536, 8, 8)):
        N = ((307200 + T - 1) // T) * T
        idx = jax.random.randint(key, (N, 1), 0, T, dtype=jnp.int32)
        table = jax.random.normal(key, (T, W), dtype=jnp.float32)
        try:
            f = jax.jit(make_sublane_gather(N, T, W, Wb))
            dt = bench(f, idx, table)
            got = f(idx, table)
            ref = table[idx[:64, 0]]
            ok = bool(jnp.allclose(ref, got[:64]))
            print(f"sublane T={T:6d} W={W:4d} Wb={Wb:4d} N={N}: "
                  f"{dt:7.3f} ms ok={ok}")
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"sublane T={T:6d} W={W:4d} Wb={Wb:4d}: FAIL "
                  f"{type(e).__name__}: {msg}")

    # lane-dim gather (planar tables)
    for T, W in ((16384, 8), (16384, 16), (2048, 8), (32768, 8)):
        N = ((307200 + T - 1) // T) * T
        idx = jax.random.randint(key, (1, N), 0, T, dtype=jnp.int32)
        table = jax.random.normal(key, (W, T), dtype=jnp.float32)
        try:
            f = jax.jit(make_lane_gather(N, T, W))
            dt = bench(f, idx, table)
            got = f(idx, table)
            ref = table[:, idx[0, :64]]
            ok = bool(jnp.allclose(ref, got[:, :64]))
            print(f"lane    T={T:6d} W={W:4d} N={N}: {dt:7.3f} ms ok={ok}")
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"lane    T={T:6d} W={W:4d}: FAIL {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
