#!/usr/bin/env python
"""Offline sweep over captured castle rays (/tmp/castle_rays.npz from
visitstats.py): total ray-tri pairs for different BLOCK_RAYS choices,
plus the exact per-ray x cluster bound (what a perfect block-level cull
would visit at each granularity).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from rt64tpu.ops import tracer_pallas as tp
from rt64tpu.ops import tracer


def main():
    d = np.load("/tmp/castle_rays.npz")
    scene = tracer.TraceScene(
        v0=jnp.asarray(d["v0"]), v1=jnp.asarray(d["v1"]),
        v2=jnp.asarray(d["v2"]), valid=jnp.asarray(d["valid"]),
        alpha=jnp.asarray(d["alpha"]), no_cull=jnp.asarray(d["no_cull"]),
        bias=jnp.asarray(d["bias"]), alpha_idx=None,
    )
    cluster_tris, lo, hi = tp.build_cluster_data(scene)
    nc = lo.shape[1]
    pops = []
    i = 0
    while f"{i}_opaque_o" in d or f"{i}_shadow_o" in d:
        kind = "opaque" if f"{i}_opaque_o" in d else "shadow"
        pops.append((
            f"{i}:{kind}",
            jnp.asarray(d[f"{i}_{kind}_o"]), jnp.asarray(d[f"{i}_{kind}_d"]),
            jnp.asarray(d[f"{i}_{kind}_tmin"]), jnp.asarray(d[f"{i}_{kind}_tmax"]),
        ))
        i += 1

    for name, o, dd, tmin, tmax in pops:
        n = o.shape[1]
        row = [name]
        for br in (128, 256, 512):
            pad = (-n) % br
            if pad:
                padf = lambda a: jnp.concatenate(
                    [a, jnp.zeros((a.shape[0], pad), a.dtype)], axis=1)
                pad1 = lambda a: jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
                op, dp = padf(o), padf(dd)
                tminp, tmaxp = pad1(tmin), pad1(tmax) - 1.0
            else:
                op, dp, tminp, tmaxp = o, dd, tmin, tmax
            _, counts, _ = tp.block_visit_lists(op, dp, tminp, tmaxp, lo, hi, br)
            total = int(np.asarray(counts).sum())
            pairs = total * br * 128 / 1e6
            # Exact bound: per-ray x cluster slab (dead rays masked),
            # any() per block.
            live = (tmaxp >= tminp)
            hit, _ = tp._slab_per_ray(op, dp, tminp, tmaxp, lo, hi)
            hit = hit & live[:, None]
            exact = int(np.asarray(
                hit.reshape(-1, br, nc).any(axis=1).sum()))
            epairs = exact * br * 128 / 1e6
            row.append(f"br={br}: visits={total} ({pairs:.0f}Mpairs) "
                       f"exact={exact} ({epairs:.0f}M)")
        print(row[0])
        for r in row[1:]:
            print("   ", r)
        # Sub-cluster granularity payoff at br=512: exact per-ray slab
        # against finer Morton-run boxes; pairs assume perfect 128-lane
        # packing of sub-cluster tiles.
        br = 512
        pad = (-n) % br
        if pad:
            padf = lambda a: jnp.concatenate(
                [a, jnp.zeros((a.shape[0], pad), a.dtype)], axis=1)
            pad1 = lambda a: jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
            op, dp = padf(o), padf(dd)
            tminp, tmaxp = pad1(tmin), pad1(tmax) - 1.0
        else:
            op, dp, tminp, tmaxp = o, dd, tmin, tmax
        live = (tmaxp >= tminp)
        for cs in (128, 64, 32):
            t_total = scene.v0.shape[1]
            ncs = t_total // cs
            act = ((d["valid"] & ~d["alpha"]))[None] > 0
            big = 3.0e37
            v0n, v1n, v2n = [np.asarray(x) for x in (scene.v0, scene.v1, scene.v2)]
            lo_t = np.minimum(np.minimum(v0n, v1n), v2n)
            hi_t = np.maximum(np.maximum(v0n, v1n), v2n)
            lo_c = jnp.asarray(
                np.where(act, lo_t, big).reshape(3, ncs, cs).min(axis=2))
            hi_c = jnp.asarray(
                np.where(act, hi_t, -big).reshape(3, ncs, cs).max(axis=2))
            hit, _ = tp._slab_per_ray(op, dp, tminp, tmaxp, lo_c, hi_c)
            hit = hit & live[:, None]
            blk = np.asarray(hit.reshape(-1, br, ncs).any(axis=1))
            vis = int(blk.sum())
            tiles = int(np.ceil(blk.sum(axis=1) * cs / 128).sum())
            print(f"    cs={cs}: sub-visits={vis} -> tiles={tiles} "
                  f"({tiles * br * 128 / 1e6:.0f}Mpairs)")


if __name__ == "__main__":
    main()
