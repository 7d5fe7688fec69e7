#!/usr/bin/env python
"""Single-config timing of the production packet kernels on the
captured castle config-2 ray populations (/tmp/castle_rays.npz from
visitstats.py) — the fast A/B loop for kernel-internal edits.

Reports per-launch ms for the primary closest-hit and batched-shadow
populations, end-to-end (visit-list build + kernel) AND kernel-only
(visit lists precomputed outside the timed region)."""

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


def time_call(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

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

    for idx, kind, o, dd, tmin, tmax in pops:
        kind = "opaque" if idx == 0 else "shadow"  # capture stores both as _opaque_
        if kind == "opaque":
            fn = jax.jit(lambda o, dd, tmin, tmax: tp.make_opaque_fn()(
                o, dd, tmin, tmax, scene))
        else:
            fn = jax.jit(lambda o, dd, tmin, tmax: tp.make_shadow_opaque_fn()(
                o, dd, tmin, tmax, scene))
        ms, out = time_call(fn, o, dd, tmin, tmax, reps=args.reps)
        tri = np.asarray(out[1])
        n = o.shape[1]
        print(f"pop{idx}({kind}): {ms:7.3f} ms end-to-end  "
              f"n={n}  hits={int((tri >= 0).sum())}", flush=True)


if __name__ == "__main__":
    main()
