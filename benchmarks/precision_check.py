#!/usr/bin/env python
"""Numerical audit of the packet kernels ON TPU against the XLA scan
tracer: the Woop intersection matmul runs at Mosaic's DEFAULT dot
precision, and this verifies what that means for the shipped
traversal — triangle-id agreement and t error on the captured castle
ray populations (the CPU parity tests run interpret mode, which is
exact f32 and cannot see device-precision effects)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _enable_cache():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )


_enable_cache()

import numpy as np
import jax
import jax.numpy as jnp


def main():
    d = np.load("/tmp/castle_rays.npz")
    from rt64tpu.ops import tracer as tr
    import rt64tpu.ops.tracer_pallas as tp

    scene = tr.TraceScene(
        v0=jnp.asarray(d["v0"]), v1=jnp.asarray(d["v1"]),
        v2=jnp.asarray(d["v2"]),
        valid=jnp.asarray(d["valid"]), alpha=jnp.asarray(d["alpha"]),
        no_cull=jnp.asarray(d["no_cull"]), bias=jnp.asarray(d["bias"]),
        alpha_idx=jnp.zeros((1,), jnp.int32), has_alpha=True,
    )
    o = jnp.asarray(d["0_opaque_o"])
    dd = jnp.asarray(d["0_opaque_d"])
    tmin = jnp.asarray(d["0_opaque_tmin"])
    tmax = jnp.asarray(d["0_opaque_tmax"])

    t_ref, tri_ref, _ = jax.jit(
        lambda: tr.trace_opaque(o, dd, tmin, tmax, scene,
                                cull_backface=True, chunk=256)
    )()
    fn = tp.make_opaque_fn()
    t_k, tri_k, _, _ = jax.jit(lambda: fn(o, dd, tmin, tmax, scene))()

    tri_ref = np.asarray(tri_ref)
    tri_k = np.asarray(tri_k)
    t_ref = np.asarray(t_ref)
    t_k = np.asarray(t_k)
    n = tri_ref.shape[0]
    agree = tri_ref == tri_k
    hit_ref = tri_ref >= 0
    both = hit_ref & (tri_k >= 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        rel = np.abs(t_k - t_ref) / np.maximum(np.abs(t_ref), 1e-6)
    rel = rel[both & agree]
    print(f"rays={n}  tri agreement={agree.mean():.6f} "
          f"(disagree={int((~agree).sum())})")
    print(f"hit/miss flips: ref-hit&kernel-miss={int((hit_ref & (tri_k < 0)).sum())} "
          f"ref-miss&kernel-hit={int((~hit_ref & (tri_k >= 0)).sum())}")
    if rel.size:
        print(f"t rel err on agreeing hits: mean={rel.mean():.3e} "
              f"p99={np.percentile(rel, 99):.3e} max={rel.max():.3e}")


if __name__ == "__main__":
    main()
