#!/usr/bin/env python
"""Texture-pool gather layouts: the (262144, 4) u32 quad-pack row
gather profiled ~2.1 ms/frame at 480p (the minor dim pads to the
128-lane tile, so each gathered row may move a full tile). Candidates:

  a) current: pool (P, 4) u32, gather rows at (N,) indices
  b) wide rows: pool (P//32, 128) u32, gather rows at idx//32, then
     select the 4-lane quad (idx%32) in-row via reshape + one-hot sum
  c) wide rows f32 bitcast variant
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

P = 262144
N = 188416
QPR = 32  # quads per wide row


def bench(fn, *args, reps=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    pool = jnp.asarray(rng.integers(0, 2**32, (P, 4), dtype=np.uint64)
                       .astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, P, (N,), dtype=np.int64)
                      .astype(np.int32))
    pool_wide = pool.reshape(P // QPR, QPR * 4)

    @jax.jit
    def a(pool, idx):
        return pool[idx].sum(dtype=jnp.uint32)

    @jax.jit
    def b(pool_wide, idx):
        rows = pool_wide[idx // QPR]  # (N, 128)
        q = jnp.mod(idx, QPR)
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, QPR), 1) == q[:, None]
        )
        quads = (
            rows.reshape(N, QPR, 4)
            * sel[..., None].astype(jnp.uint32)
        ).sum(axis=1)
        return quads.sum(dtype=jnp.uint32)

    @jax.jit
    def b2(pool_wide, idx):
        # f32 compute for the select (VPU-native), bitcast round trip
        rows = jax.lax.bitcast_convert_type(
            pool_wide[idx // QPR], jnp.float32
        )
        q = jnp.mod(idx, QPR)
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, QPR), 1) == q[:, None]
        )
        quads = jnp.where(sel[..., None], rows.reshape(N, QPR, 4), 0.0).sum(
            axis=1
        )
        return jax.lax.bitcast_convert_type(quads, jnp.uint32).sum(
            dtype=jnp.uint32
        )

    # one-hot matmul select: rows (N, 128) f32 x per-lane mask
    @jax.jit
    def c(pool_wide, idx):
        rows = pool_wide[idx // QPR].astype(jnp.float32)  # (N,128) (lossy, timing only)
        q = jnp.mod(idx, QPR)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, QPR * 4), 1)
        keep = (lane // 4) == q[:, None]  # (N,128)
        k = jnp.where(keep, rows, 0.0).reshape(N, QPR, 4).sum(axis=1)
        return k.sum()

    print("a (P,4) row gather:   %.3f ms" % bench(a, pool, idx))
    print("b (P/32,128) + onehot:%.3f ms" % bench(b, pool_wide, idx))
    print("b2 f32 where select:  %.3f ms" % bench(b2, pool_wide, idx))
    print("c f32 mask sum:       %.3f ms" % bench(c, pool_wide, idx))


if __name__ == "__main__":
    main()
