#!/usr/bin/env python
"""Sweep the packet-kernel granularity constants (BLOCK_RAYS,
SUPER_BLOCKS, VISIT_UNROLL) over the captured castle config-2 ray
populations (/tmp/castle_rays.npz from visitstats.py), timing the FULL
production entry points (visit-list build + kernel) end-to-end.

Module constants are swept by reloading tracer_pallas with patched
globals — the module-level jitted impls are rebuilt fresh each
variant, so no stale jit cache."""

import argparse
import importlib
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

    from rt64tpu.ops import tracer as tr

    scene = tr.TraceScene(
        v0=jnp.asarray(d["v0"]), v1=jnp.asarray(d["v1"]),
        v2=jnp.asarray(d["v2"]),
        valid=jnp.asarray(d["valid"]), alpha=jnp.asarray(d["alpha"]),
        no_cull=jnp.asarray(d["no_cull"]), bias=jnp.asarray(d["bias"]),
        alpha_idx=jnp.zeros((1,), jnp.int32), has_alpha=True,
    )

    pops = []
    i = 0
    while True:
        kind = None
        for k in ("opaque", "shadow"):
            if f"{i}_{k}_o" in d:
                kind = k
        if kind is None:
            break
        pops.append((i, kind, jnp.asarray(d[f"{i}_{kind}_o"]),
                     jnp.asarray(d[f"{i}_{kind}_d"]),
                     jnp.asarray(d[f"{i}_{kind}_tmin"]),
                     jnp.asarray(d[f"{i}_{kind}_tmax"])))
        i += 1

    grid = []
    for br in (256, 512, 1024):
        for sb in (2, 4, 8):
            grid.append((br, sb, 4))
    base = {}
    for br, sbk, vu in grid:
        import rt64tpu.ops.tracer_pallas as tp

        tp = importlib.reload(tp)
        tp.BLOCK_RAYS = br
        tp.SUPER_BLOCKS = sbk
        tp.VISIT_UNROLL = vu
        label = f"B={br} S={sbk} U={vu}"
        line = [label]
        for idx, kind, o, dd, tmin, tmax in pops:
            # pop 0 = primary closest-hit; pop 1 = batched shadows
            if idx == 0:
                fn = jax.jit(
                    lambda o, dd, tmin, tmax: tp.make_opaque_fn()(
                        o, dd, tmin, tmax, scene
                    )
                )
            else:
                fn = jax.jit(
                    lambda o, dd, tmin, tmax: tp.make_shadow_opaque_fn()(
                        o, dd, tmin, tmax, scene
                    )
                )
            ms, out = time_call(fn, o, dd, tmin, tmax, reps=args.reps)
            key = (idx,)
            tri = np.asarray(out[1])
            if key not in base:
                base[key] = tri
                match = "ref"
            else:
                match = "OK" if (tri == base[key]).all() else "MISMATCH"
            line.append(f"pop{idx}({kind[0]}): {ms:7.3f} ms {match}")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
