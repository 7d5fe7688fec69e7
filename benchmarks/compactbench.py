#!/usr/bin/env python
"""Microbenchmark: ray-compaction strategies at launch scale.

compact_indices (cumsum + scatter) shows up ~4 ms/frame at config-2
scale across the alpha-candidate launches; this compares it against a
two-level cumsum and a sort-based form.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _enable_cache():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )


_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np


def compact_scatter(mask, capacity):
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    tgt = jnp.where(mask & (pos < capacity), pos, capacity)
    idx = jnp.full((capacity,), n, jnp.int32)
    idx = idx.at[tgt].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    return idx, mask.sum()


def compact_scatter_2l(mask, capacity, block=2048):
    """Two-level cumsum: per-block sums -> tiny exclusive scan ->
    in-block cumsum. O(2N) traffic instead of XLA's generic scan."""
    n = mask.shape[0]
    nb = n // block
    m = mask.reshape(nb, block).astype(jnp.int32)
    row = jnp.cumsum(m, axis=1)
    sums = row[:, -1]
    offs = jnp.cumsum(sums) - sums
    pos = (row - 1 + offs[:, None]).reshape(n)
    tgt = jnp.where(mask & (pos < capacity), pos, capacity)
    idx = jnp.full((capacity,), n, jnp.int32)
    idx = idx.at[tgt].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    return idx, sums.sum()


def compact_sort(mask, capacity):
    n = mask.shape[0]
    key = jnp.where(mask, jnp.arange(n, dtype=jnp.int32),
                    jnp.int32(0x7FFFFFFF))
    idx = jax.lax.top_k(-key, capacity)[0]
    return -idx, mask.sum()


def main():
    rng = np.random.default_rng(0)
    n = 376832
    capacity = 11776
    mask = jnp.asarray(rng.random(n) < 0.02)

    def bench(name, fn):
        jf = jax.jit(lambda m: fn(m, capacity))
        idx, cnt = jf(mask)
        float(jnp.asarray(idx, jnp.float32).sum())  # real sync
        reps = 50
        t0 = time.perf_counter()
        for _ in range(reps):
            idx, cnt = jf(mask)
        float(jnp.asarray(idx, jnp.float32).sum())
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)
        return np.asarray(idx)

    a = bench("cumsum+scatter   ", compact_scatter)
    b = bench("2-level cumsum   ", compact_scatter_2l)
    c = bench("sort/top_k       ", compact_sort)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.sort(a[a < n]), np.sort(c[c < n])[: (a < n).sum()])


if __name__ == "__main__":
    main()
