#!/usr/bin/env python
"""Dissect the Woop pair-visit cost: matmul vs elementwise tail, and
the bf16-operand matmul variant (MXU native width; the f32 form costs
multiple passes). Decides whether a reduced-precision intersection
matmul is worth plumbing through the packet kernels."""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 512
C = 128
VISITS = 32


def make_kernel(variant: str):
    def kernel(rays8_ref, mats_ref, out_t_ref):
        o4 = jnp.concatenate(
            [rays8_ref[0:3].T, jnp.ones((B, 1), jnp.float32),
             jnp.zeros((B, 4), jnp.float32)], axis=1
        )
        d4 = jnp.concatenate(
            [rays8_ref[3:6].T, jnp.zeros((B, 5), jnp.float32)], axis=1
        )
        od = jnp.concatenate([o4, d4], axis=0)  # (2B, 8)
        if variant == "bf16":
            od = od.astype(jnp.bfloat16)
        best = jnp.full((B, C), 3e37, jnp.float32)

        def tail(sr, best):
            sx, sy, sz = sr[:B, :C], sr[:B, C : 2 * C], sr[:B, 2 * C :]
            rx, ry, rz = sr[B:, :C], sr[B:, C : 2 * C], sr[B:, 2 * C :]
            keep = jnp.abs(rz) > 1e-12
            t = -sz / jnp.where(keep, rz, 1.0)
            u = sx + t * rx
            v = sy + t * ry
            hit = keep & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
            key = jnp.where(hit, t, 3e37)
            return jnp.minimum(best, key)

        def occl_tail(sr, best):
            sx, sy, sz = sr[:B, :C], sr[:B, C : 2 * C], sr[:B, 2 * C :]
            rx, ry, rz = sr[B:, :C], sr[B:, C : 2 * C], sr[B:, 2 * C :]
            keep = jnp.abs(rz) > 1e-12
            q = rz * rz
            p = -(sz * rz)
            uq = sx * q + p * rx
            vq = sy * q + p * ry
            hit = (keep & (q > 0.0) & (uq >= 0.0) & (vq >= 0.0)
                   & (uq + vq <= q) & (p >= 0.0) & (p <= q * 3e37))
            return jnp.minimum(best, jnp.where(hit, 1.0, 3e37))

        def body(i, best):
            m = mats_ref[i]
            if variant == "bf16":
                sr = jnp.dot(od, m.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            else:
                sr = jnp.dot(od, m, preferred_element_type=jnp.float32)
            if variant == "mm_only":
                return jnp.minimum(best, sr[:B, :C])
            if variant == "occl":
                return occl_tail(sr, best)
            return tail(sr, best)

        best = jax.lax.fori_loop(0, VISITS, body, best)
        out_t_ref[:] = best.min(axis=1, keepdims=True)

    return kernel


def main():
    rng = np.random.default_rng(0)
    n_prog = 64
    rays = rng.standard_normal((8, B), np.float32)
    rays8 = jnp.asarray(np.tile(rays[None], (n_prog, 1, 1)))
    mats = jnp.asarray(
        rng.standard_normal((VISITS, 8, 3 * C)).astype(np.float32)
    )
    for variant in ("f32", "bf16", "mm_only", "occl"):
        fn = pl.pallas_call(
            make_kernel(variant),
            grid=(n_prog,),
            in_specs=[
                pl.BlockSpec((None, 8, B), lambda p: (p, 0, 0)),
                pl.BlockSpec((VISITS, 8, 3 * C), lambda p: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((None, B, 1), lambda p: (p, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_prog, B, 1), jnp.float32),
        )
        fn = jax.jit(fn)
        out = fn(rays8, mats)
        jax.block_until_ready(out)
        t0 = time.time()
        reps = 30
        for _ in range(reps):
            out = fn(rays8, mats)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / reps * 1e3
        per = ms * 1e3 / (n_prog * VISITS)
        print(f"{variant:8s}: {ms:6.3f} ms  -> {per:5.3f} us/visit")


if __name__ == "__main__":
    main()
