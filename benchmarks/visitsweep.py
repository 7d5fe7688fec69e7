#!/usr/bin/env python
"""Offline sweep over captured castle rays (/tmp/castle_rays.npz from
visitstats.py), pure NumPy (no jit): per-population exact per-ray x
cluster visit bounds at several cluster granularities, plus the effect
of masking dead rays out of the level-1 test.
"""

import numpy as np

_BIG = 3.0e37


def slab_per_ray(o, d, tmin, tmax, lo, hi):
    """NumPy mirror of tracer_pallas._slab_per_ray (N, M)."""
    n = o.shape[1]
    m = lo.shape[1]
    t_lo = np.full((n, m), -np.inf, np.float32)
    t_hi = np.full((n, m), np.inf, np.float32)
    for c in range(3):
        oc = o[c][:, None]
        dc = d[c]
        par = (np.abs(dc) <= 1e-12)[:, None]
        idir = (1.0 / np.where(np.abs(dc) > 1e-12, dc, 1.0))[:, None]
        ta = (lo[c][None, :] - oc) * idir
        tb = (hi[c][None, :] - oc) * idir
        t_lo = np.maximum(t_lo, np.where(par, -_BIG, np.minimum(ta, tb)))
        t_hi = np.minimum(t_hi, np.where(par, _BIG, np.maximum(ta, tb)))
    t_lo = t_lo - np.abs(t_lo) * 1e-5 - 1e-4
    t_hi = t_hi + np.abs(t_hi) * 1e-5 + 1e-4
    hit = (t_lo <= t_hi) & (t_hi >= tmin[:, None]) & (t_lo <= tmax[:, None])
    box_ok = np.all(lo <= hi, axis=0)
    return hit & box_ok[None, :]


def cluster_boxes(v0, v1, v2, act, cs):
    t = v0.shape[1]
    ncs = t // cs
    lo_t = np.minimum(np.minimum(v0, v1), v2)
    hi_t = np.maximum(np.maximum(v0, v1), v2)
    lo = np.where(act, lo_t, _BIG).reshape(3, ncs, cs).min(axis=2)
    hi = np.where(act, hi_t, -_BIG).reshape(3, ncs, cs).max(axis=2)
    return lo.astype(np.float32), hi.astype(np.float32)


def main():
    d = np.load("/tmp/castle_rays.npz")
    v0, v1, v2 = d["v0"], d["v1"], d["v2"]
    act = (d["valid"] & ~d["alpha"])[None] > 0

    pops = []
    i = 0
    while f"{i}_opaque_o" in d or f"{i}_shadow_o" in d:
        kind = "opaque" if f"{i}_opaque_o" in d else "shadow"
        pops.append((f"{i}:{kind}", d[f"{i}_{kind}_o"], d[f"{i}_{kind}_d"],
                     d[f"{i}_{kind}_tmin"], d[f"{i}_{kind}_tmax"]))
        i += 1

    br = 512
    for name, o, dd, tmin, tmax in pops:
        n = o.shape[1]
        pad = (-n) % br
        if pad:
            o = np.concatenate([o, np.zeros((3, pad), o.dtype)], axis=1)
            dd = np.concatenate([dd, np.zeros((3, pad), dd.dtype)], axis=1)
            tmin = np.concatenate([tmin, np.zeros(pad, tmin.dtype)])
            tmax = np.concatenate([tmax, np.full(pad, -1.0, tmax.dtype)])
        live = tmax >= tmin
        nlive = int(live.sum())
        print(f"{name}: n={o.shape[1]} live={nlive} ({100*nlive//o.shape[1]}%)")
        for cs in (128, 64, 32):
            lo, hi = cluster_boxes(v0, v1, v2, act, cs)
            ncs = lo.shape[1]
            blks, leaks = [], []
            chunk = 16 * br
            for s in range(0, o.shape[1], chunk):
                sl = slice(s, s + chunk)
                hit = slab_per_ray(o[:, sl], dd[:, sl], tmin[sl], tmax[sl],
                                   lo, hi)
                lv = live[sl][:, None]
                blks.append((hit & lv).reshape(-1, br, ncs).any(axis=1))
                leaks.append((hit & ~lv).reshape(-1, br, ncs).any(axis=1))
            blk = np.concatenate(blks)
            vis = int(blk.sum())
            # tiles = 128-lane compute tiles if sub-clusters packed
            # perfectly into 128-wide tiles per block
            tiles = int(np.ceil(blk.sum(axis=1) * cs / 128).sum())
            leak = int(np.concatenate(leaks).sum())
            print(f"  cs={cs:3d}: block-visits={vis}"
                  f" tiles128={tiles} ({tiles * br * 128 / 1e6:.0f}Mpairs)"
                  f" [+deadray-only blocks {leak}]")


if __name__ == "__main__":
    main()
