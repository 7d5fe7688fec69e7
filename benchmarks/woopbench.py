#!/usr/bin/env python
"""Microbenchmark: VPU Moller-Trumbore cluster tile vs MXU Woop
(unit-triangle transform) intersection.

The packet kernels spend ~all their time in the 512x128 ray x triangle
tile. MT is pure VPU (~45 elementwise ops/pair). The Woop form
precomputes a 3x4 affine transform per triangle (world -> unit
triangle); intersection is then two small matmuls (rays @ transform)
that ride the MXU plus a ~15-op VPU tail:
    s = W(o - v0), r = W d, t = -s_z / r_z,
    u = s_x + t r_x, v = s_y + t r_y, backface sign = sign(r_z).
"""

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

B = 512  # rays per block
C = 128  # triangles per cluster
VISITS = 32  # cluster visits per program (loop iterations)


def _mt_tile(tri, ox, oy, oz, dx, dy, dz):
    """Current MT math (tracer_pallas._mt_cluster, trimmed flags)."""
    v0x, v0y, v0z = tri[0][None], tri[1][None], tri[2][None]
    e1x, e1y, e1z = tri[3][None], tri[4][None], tri[5][None]
    e2x, e2y, e2z = tri[6][None], tri[7][None], tri[8][None]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    keep = jnp.abs(det) > 1e-9
    inv_det = 1.0 / jnp.where(keep, det, 1.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = keep & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
    return hit, t


def mt_kernel(rays_ref, tris_ref, out_t_ref):
    ox = rays_ref[0].reshape(B, 1)
    oy = rays_ref[1].reshape(B, 1)
    oz = rays_ref[2].reshape(B, 1)
    dx = rays_ref[3].reshape(B, 1)
    dy = rays_ref[4].reshape(B, 1)
    dz = rays_ref[5].reshape(B, 1)
    best = jnp.full((B, C), 3e37, jnp.float32)

    def body(i, best):
        tri = tris_ref[i]
        hit, t = _mt_tile(tri, ox, oy, oz, dx, dy, dz)
        key = jnp.where(hit, t, 3e37)
        return jnp.minimum(best, key)

    best = jax.lax.fori_loop(0, VISITS, body, best)
    out_t_ref[:] = best.min(axis=1, keepdims=True)


def woop_kernel(rays8_ref, mats_ref, out_t_ref):
    # rays8: (8, B) -> build (2B, 8) [o,1,0...; d,0,...] once per program.
    o4 = jnp.concatenate(
        [rays8_ref[0:3].T, jnp.ones((B, 1), jnp.float32),
         jnp.zeros((B, 4), jnp.float32)], axis=1
    )  # (B, 8)
    d4 = jnp.concatenate(
        [rays8_ref[3:6].T, jnp.zeros((B, 5), jnp.float32)], axis=1
    )
    od = jnp.concatenate([o4, d4], axis=0)  # (2B, 8)
    best = jnp.full((B, C), 3e37, jnp.float32)

    def body(i, best):
        m = mats_ref[i]  # (8, 3*C): rows = [W|-Wv0] cols grouped x/y/z
        sr = jnp.dot(od, m, preferred_element_type=jnp.float32)  # (2B, 3C)
        sx, sy, sz = sr[:B, :C], sr[:B, C : 2 * C], sr[:B, 2 * C :]
        rx, ry, rz = sr[B:, :C], sr[B:, C : 2 * C], sr[B:, 2 * C :]
        keep = jnp.abs(rz) > 1e-12
        t = -sz / jnp.where(keep, rz, 1.0)
        u = sx + t * rx
        v = sy + t * ry
        hit = keep & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
        key = jnp.where(hit, t, 3e37)
        return jnp.minimum(best, key)

    best = jax.lax.fori_loop(0, VISITS, body, best)
    out_t_ref[:] = best.min(axis=1, keepdims=True)


def main():
    rng = np.random.default_rng(0)
    n_prog = 64
    rays = rng.standard_normal((8, B), np.float32)
    rays8 = jnp.asarray(np.tile(rays[None], (n_prog, 1, 1)))
    # MT triangle rows: (VISITS, 9, C)
    tris = jnp.asarray(rng.standard_normal((VISITS, 9, C)).astype(np.float32))
    # Woop matrices: (VISITS, 8, 3C); rows 0..3 used (x,y,z,1).
    mats = jnp.asarray(
        rng.standard_normal((VISITS, 8, 3 * C)).astype(np.float32)
    )

    grid = (n_prog,)
    mt = pl.pallas_call(
        mt_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 8, B), lambda p: (p, 0, 0)),
            pl.BlockSpec((VISITS, 9, C), lambda p: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, B, 1), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_prog, B, 1), jnp.float32),
    )
    woop = pl.pallas_call(
        woop_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 8, B), lambda p: (p, 0, 0)),
            pl.BlockSpec((VISITS, 8, 3 * C), lambda p: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, B, 1), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_prog, B, 1), jnp.float32),
    )

    def bench(name, fn, *args):
        jf = jax.jit(fn)
        # Real sync: on the axon tunnel block_until_ready can return
        # before execution finishes; a value fetch cannot.
        float(jf(*args).sum())
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jf(*args)
        float(out.sum())
        dt = (time.perf_counter() - t0) / reps
        per_visit = dt / (n_prog * VISITS) * 1e6
        print(f"{name}: {dt*1e3:.3f} ms for {n_prog}x{VISITS} visits "
              f"-> {per_visit:.3f} us/visit")
        return dt

    t_mt = bench("mt  ", mt, rays8, tris)
    t_wp = bench("woop", woop, rays8, mats)
    print(f"speedup: {t_mt / t_wp:.2f}x")


if __name__ == "__main__":
    main()
