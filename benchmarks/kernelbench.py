#!/usr/bin/env python
"""Isolated Pallas-kernel timings on captured castle ray populations
(/tmp/castle_rays.npz from visitstats.py).

Times ONLY the packet-kernel custom-call (visit lists precomputed and
held on device), so per-program fixed overhead and per-visit cost can
be separated from the XLA pre-pass when tuning kernel granularity.
"""

import argparse
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

import numpy as np
import jax
import jax.numpy as jnp

from rt64tpu.ops import tracer_pallas as tp


def time_call(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    d = np.load("/tmp/castle_rays.npz")

    class Scene:
        v0 = jnp.asarray(d["v0"]); v1 = jnp.asarray(d["v1"])
        v2 = jnp.asarray(d["v2"])
        valid = jnp.asarray(d["valid"]); alpha = jnp.asarray(d["alpha"])
        no_cull = jnp.asarray(d["no_cull"]); bias = jnp.asarray(d["bias"])
        num_triangles = d["v0"].shape[1]

    scene = Scene()
    cluster_tris, lo, hi = tp.build_cluster_data(scene)
    pad_cluster = jnp.zeros((1,) + cluster_tris.shape[1:], cluster_tris.dtype)
    cluster_tris_p = jnp.concatenate([cluster_tris, pad_cluster], axis=0)

    pops = []
    i = 0
    while f"{i}_opaque_o" in d or f"{i}_shadow_o" in d:
        kind = "opaque" if f"{i}_opaque_o" in d else "shadow"
        pops.append((kind, d[f"{i}_{kind}_o"], d[f"{i}_{kind}_d"],
                     d[f"{i}_{kind}_tmin"], d[f"{i}_{kind}_tmax"]))
        i += 1

    for kind, o, dd, tmin, tmax in pops:
        o = jnp.asarray(o); dd = jnp.asarray(dd)
        tmin = jnp.asarray(tmin); tmax = jnp.asarray(tmax)
        n = o.shape[1]
        pad = (-n) % tp.BLOCK_RAYS
        if pad:
            padf = lambda a: jnp.concatenate(
                [a, jnp.zeros((a.shape[0], pad), a.dtype)], axis=1)
            pad1 = lambda a: jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
            o, dd = padf(o), padf(dd)
            tmin, tmax = pad1(tmin), pad1(tmax) - 1.0
        visits, counts, entries = jax.jit(
            tp.block_visit_lists, static_argnums=(6,)
        )(o, dd, tmin, tmax, lo, hi, tp.BLOCK_RAYS)
        jax.block_until_ready(visits)
        rays8 = jnp.concatenate([o, dd, tmin[None], tmax[None]], axis=0)
        n_blocks = rays8.shape[1] // tp.BLOCK_RAYS
        nvis = float(jnp.sum(counts))

        if kind == "opaque":
            ms, old = time_call(
                lambda *a: tp._trace_opaque_pallas_impl(
                    *a, cull_backface=True, interpret=False),
                rays8, cluster_tris_p, visits, counts, entries,
                reps=args.reps)
            ms2, new = time_call(
                lambda *a: tp._trace_opaque_vmem_impl(
                    *a, cull_backface=True, interpret=False),
                rays8, cluster_tris_p, visits, counts, entries,
                reps=args.reps)
            match = all(
                bool(jnp.all(jnp.where(o == o, o == m, True)))
                for o, m in zip(old[:2], new[:2])
            )
        else:
            ms, old = time_call(
                lambda *a: tp._shadow_pallas_impl(*a, interpret=False),
                rays8, cluster_tris_p, visits, counts, entries,
                reps=args.reps)
            ms2, new = time_call(
                lambda *a: tp._shadow_vmem_impl(*a, interpret=False),
                rays8, cluster_tris_p, visits, counts, entries,
                reps=args.reps)
            match = bool(jnp.all(old == new))
        print(f"{kind}: n={n} blocks={n_blocks} visits={nvis:.0f} "
              f"dma={ms:.3f} ms vmem={ms2:.3f} ms "
              f"({ms2*1e3/n_blocks:.2f} us/block, "
              f"{ms2*1e3/max(nvis,1):.2f} us/visit) match={match}")


if __name__ == "__main__":
    main()
