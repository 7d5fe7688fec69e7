#!/usr/bin/env python
"""Acceleration-structure scaling: trace cost vs triangle count.

The two-level cull (groups of Morton-adjacent clusters, then block
frustums vs clusters — ops/tracer_pallas.block_visit_lists) must keep
packet traversal sublinear in scene size, the property the reference
gets from the driver BVH (contrib/nv_helpers_dx12). A synthetic rolling
terrain is traced at several triangle counts with the same camera.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
def _enable_cache():
    # This jax version ignores JAX_COMPILATION_CACHE_DIR set in-process.
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )


_enable_cache()

import numpy as np
import jax
import jax.numpy as jnp

from rt64tpu.ops import tracer, tracer_pallas
from rt64tpu.utils.profiling import stage_bench


def terrain_scene(n_tris, extent=100.0, seed=0):
    """Rolling terrain grid with ~n_tris triangles, Morton-ordered."""
    rng = np.random.default_rng(seed)
    n_cells = n_tris // 2
    side = int(np.sqrt(n_cells))
    xs = np.linspace(-extent, extent, side + 1)
    zs = np.linspace(-extent, extent, side + 1)
    xx, zz = np.meshgrid(xs, zs)
    yy = (np.sin(xx * 0.15) * np.cos(zz * 0.11) * 3.0
          + rng.normal(0, 0.3, xx.shape))
    verts = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32)
    idx = []
    for r in range(side):
        for c in range(side):
            a = r * (side + 1) + c
            b = a + 1
            d = a + side + 1
            e = d + 1
            idx.append((a, e, b))
            idx.append((a, d, e))
    idx = np.array(idx, np.int64)

    from rt64tpu.ops.geometry import morton_order
    perm = morton_order(verts, idx)
    idx = idx[perm]
    t = idx.shape[0]
    pad = (-t) % tracer_pallas.CLUSTER_SIZE
    tri = verts[idx]
    v0 = np.concatenate([tri[:, 0], np.zeros((pad, 3), np.float32)])
    v1 = np.concatenate([tri[:, 1], np.zeros((pad, 3), np.float32)])
    v2 = np.concatenate([tri[:, 2], np.zeros((pad, 3), np.float32)])
    valid = np.concatenate([np.ones(t, bool), np.zeros(pad, bool)])
    ts = t + pad
    return tracer.TraceScene(
        v0=jnp.asarray(v0.T), v1=jnp.asarray(v1.T), v2=jnp.asarray(v2.T),
        valid=jnp.asarray(valid), alpha=jnp.zeros(ts, bool),
        no_cull=jnp.zeros(ts, bool), bias=jnp.zeros(ts, jnp.float32),
        alpha_idx=jnp.full((64,), -1, jnp.int32),
    ), t


def camera_rays(w, h, eye=(0.0, 25.0, 90.0)):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    dx = (xs / w) * 2 - 1
    dy = (ys / h) * 2 - 1
    d = np.stack([dx * 0.8, -dy * 0.5 - 0.35, -np.ones_like(dx)], 0)
    o = np.broadcast_to(np.array(eye, np.float32)[:, None, None], d.shape)
    n = w * h
    return (jnp.asarray(o.reshape(3, n)), jnp.asarray(d.reshape(3, n)),
            jnp.full((n,), 0.1, jnp.float32), jnp.full((n,), 1e5, jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--sizes", type=str, default="8192,65536,262144")
    args = ap.parse_args()

    origins, dirs, t_min, t_max = camera_rays(args.width, args.height)
    fn = tracer_pallas.make_opaque_fn()
    results = []
    for n_tris in [int(s) for s in args.sizes.split(",")]:
        scene, t_real = terrain_scene(n_tris)

        def step(c, scene=scene):
            t, tri, uv = fn(origins, dirs, t_min + c * 1e-30, t_max, scene)
            return c + t.sum() * 0 + 1

        ms = stage_bench(f"trace_{n_tris}", step, jnp.float32(0), iters=10,
                         reps=3)
        hit = jax.jit(lambda scene=scene: (fn(
            origins, dirs, t_min, t_max, scene)[1] >= 0).mean())()
        results.append((t_real, ms))
        print(f"tris={t_real:>7} trace={ms:8.3f} ms  hit_rate={float(hit):.2f}")

    base_t, base_ms = results[0]
    for t, ms in results[1:]:
        ratio = (ms / base_ms) / (t / base_t)
        print(f"{t/base_t:.0f}x tris -> {ms/base_ms:.2f}x time "
              f"(sublinearity {ratio:.3f}; <1 is sublinear)")


if __name__ == "__main__":
    main()
