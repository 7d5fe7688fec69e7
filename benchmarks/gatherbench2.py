#!/usr/bin/env python
"""Microbench: XLA gather cost on TPU as a function of row width,
table size, and index pattern — to decide whether consolidating many
narrow per-pixel gathers into one wide-row gather pays.

Also tests: one-hot matmul gather (MXU) for small tables, and a Pallas
kernel gather via jnp.take from a VMEM-resident table.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.asarray(x).sum())


def bench(fn, *args, reps=20):
    out = fn(*args)
    sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    s = sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    return dt


def main():
    N = 307200  # pixels at 640x480
    key = jax.random.PRNGKey(0)

    print(f"== row gather: out[N={N}, W] = table[T, W][idx] ==")
    for T in (16384, 262144):
        idx = jax.random.randint(key, (N,), 0, T, dtype=jnp.int32)
        for W in (1, 4, 8, 16, 32, 64, 128, 256):
            table = jax.random.normal(key, (T, W), dtype=jnp.float32)
            f = jax.jit(lambda t, i: t[i])
            dt = bench(f, table, idx)
            mb = N * W * 4 / 1e6
            print(f"  T={T:7d} W={W:4d}: {dt:7.3f} ms  "
                  f"({mb:8.1f} MB out, {mb/dt:8.2f} GB/s)")

    print(f"\n== same but sorted (coherent) indices ==")
    T = 16384
    idx = jnp.sort(jax.random.randint(key, (N,), 0, T, dtype=jnp.int32))
    for W in (8, 128):
        table = jax.random.normal(key, (T, W), dtype=jnp.float32)
        f = jax.jit(lambda t, i: t[i])
        dt = bench(f, table, idx)
        print(f"  T={T} W={W:4d} sorted: {dt:7.3f} ms")

    print(f"\n== permutation gather (history reprojection analog) ==")
    idx = jax.random.permutation(key, N).astype(jnp.int32)
    for W in (3, 4, 16):
        table = jax.random.normal(key, (N, W), dtype=jnp.float32)
        f = jax.jit(lambda t, i: t[i])
        dt = bench(f, table, idx)
        print(f"  N={N} W={W:4d} perm: {dt:7.3f} ms")

    print(f"\n== gather along lanes: out[W, N] = table[W_t, N_t] style ==")
    # planar layout: table [W, T], gather on axis 1
    T = 16384
    idx = jax.random.randint(key, (N,), 0, T, dtype=jnp.int32)
    for W in (4, 16):
        table = jax.random.normal(key, (W, T), dtype=jnp.float32)
        f = jax.jit(lambda t, i: t[:, i])
        dt = bench(f, table, idx)
        print(f"  planar W={W:4d}: {dt:7.3f} ms")

    print(f"\n== one-hot matmul gather (MXU), small table ==")
    for T in (128, 512, 2048):
        idx = jax.random.randint(key, (N,), 0, T, dtype=jnp.int32)
        for W in (16, 128):
            table = jax.random.normal(key, (T, W), dtype=jnp.float32)

            def f(t, i):
                oh = jax.nn.one_hot(i, t.shape[0], dtype=jnp.bfloat16)
                return jnp.dot(oh, t.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

            dt = bench(jax.jit(f), table, idx)
            print(f"  T={T:5d} W={W:4d}: {dt:7.3f} ms")

    print(f"\n== multiple narrow gathers vs one wide ==")
    T = 16384
    idx = jax.random.randint(key, (N,), 0, T, dtype=jnp.int32)
    tabs = [jax.random.normal(jax.random.fold_in(key, i), (T, 4),
                              dtype=jnp.float32) for i in range(8)]

    def many(i, *ts):
        return sum(t[i].sum() for t in ts)

    dt = bench(jax.jit(many), idx, *tabs)
    print(f"  8 x W=4 gathers: {dt:7.3f} ms")
    wide = jnp.concatenate(tabs, axis=1)

    def one(i, t):
        return t[i].sum()

    dt = bench(jax.jit(one), idx, wide)
    print(f"  1 x W=32 gather: {dt:7.3f} ms")


if __name__ == "__main__":
    main()
