#!/usr/bin/env python
"""Diagnostic: cluster-visit statistics for the castle frame's ray
populations (primary + per-light shadows). Reports, per kernel launch,
how many clusters each 512-ray block visits — the direct driver of
packet-tracer cost (each visit is one 512x128 Moller-Trumbore tile).

Also sweeps hypothetical (BLOCK_RAYS, CLUSTER_SIZE) combos on the same
ray populations to estimate whether finer granularity would cut total
ray-tri work.
"""

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

from rt64tpu.ops import tracer_pallas as tp
from rt64tpu.ops import tracer


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    args = ap.parse_args()

    from rt64tpu.utils.castle_scene import build_castle_scene

    dev, scene, view = build_castle_scene(
        width=args.width, height=args.height, gi_samples=0
    )
    view.max_reflections = 0
    view.update()
    r = view._renderer
    cfg = r._config()
    gp = r._global_params(cfg)
    from rt64tpu.pipeline import framegraph as fg
    from rt64tpu.pipeline import rows as R

    sb = r._sb
    from rt64tpu.ops import shading as shade_ops
    tri_rows, rows_t = shade_ops.build_tri_rows(sb)
    ts = fg.make_trace_scene(sb, rows_t, cfg.alpha_cap)
    print(f"tris={r.packer.triangle_count} padded={ts.v0.shape[1]} "
          f"max_lights={cfg.max_lights} has_alpha={ts.has_alpha}")

    # Capture the actual ray populations by monkeypatching the two
    # trace entry points.
    captured = []
    orig_opaque = tracer.trace_opaque_only
    orig_shadow = tracer.trace_shadow

    def cap_opaque(origins, dirs, t_min, t_max, scene, **kw):
        captured.append(("opaque", origins, dirs, t_min, t_max))
        return orig_opaque(origins, dirs, t_min, t_max, scene, **kw)

    def cap_shadow(origins, dirs, t_min, t_max, scene, *a, **kw):
        captured.append(("shadow", origins, dirs, t_min, t_max))
        return orig_shadow(origins, dirs, t_min, t_max, scene, *a, **kw)

    tracer.trace_opaque_only = cap_opaque
    tracer.trace_shadow = cap_shadow
    try:
        hist = fg.History.zeros(cfg.rt_height, cfg.rt_width)
        bg = r._background_planes(cfg)
        # Trace (don't compile/run) to record ray shapes symbolically is
        # not possible — run eagerly-ish via jax.eval_shape? The monkeypatch
        # must see concrete rays: run the frame WITHOUT jit (slow but one
        # frame of tracing on TPU ops still executes compiled per-op).
        out = fg.render_frame(sb, gp, hist, r.bn_table, bg, cfg=cfg)
        jax.block_until_ready(out.image)
    finally:
        tracer.trace_opaque_only = orig_opaque
        tracer.trace_shadow = orig_shadow

    print(f"captured {len(captured)} trace calls")
    # Persist the captured populations + scene for offline sweeps.
    save = {}
    for i, (kind, o, d, tmin, tmax) in enumerate(captured):
        save[f"{i}_{kind}_o"] = np.asarray(o)
        save[f"{i}_{kind}_d"] = np.asarray(d)
        save[f"{i}_{kind}_tmin"] = np.asarray(tmin)
        save[f"{i}_{kind}_tmax"] = np.asarray(tmax)
    save["v0"] = np.asarray(ts.v0); save["v1"] = np.asarray(ts.v1)
    save["v2"] = np.asarray(ts.v2)
    save["valid"] = np.asarray(ts.valid); save["alpha"] = np.asarray(ts.alpha)
    save["no_cull"] = np.asarray(ts.no_cull); save["bias"] = np.asarray(ts.bias)
    np.savez("/tmp/castle_rays.npz", **save)
    print("saved /tmp/castle_rays.npz")
    cluster_tris, lo, hi = tp.build_cluster_data(ts)
    for kind, o, d, tmin, tmax in captured:
        o = jnp.asarray(o)
        n = o.shape[1]
        pad = (-n) % tp.BLOCK_RAYS
        if pad:
            padf = lambda a: jnp.concatenate(
                [a, jnp.zeros((a.shape[0], pad), a.dtype)], axis=1)
            pad1 = lambda a: jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
            o, d = padf(o), padf(d)
            tmin, tmax = pad1(tmin), pad1(tmax) - 1.0
        visits, counts, entries = tp.block_visit_lists(
            o, d, tmin, tmax, lo, hi, tp.BLOCK_RAYS)
        c = np.asarray(counts)
        live = np.asarray((tmax >= tmin).reshape(-1, tp.BLOCK_RAYS).sum(1))
        print(f"{kind}: n={n} blocks={len(c)} visits mean={c.mean():.1f} "
              f"p50={np.percentile(c,50):.0f} p90={np.percentile(c,90):.0f} "
              f"max={c.max()} total={c.sum()} live_rays={live.sum()}"
              f" ({100*live.sum()/(len(c)*tp.BLOCK_RAYS):.0f}%)")


if __name__ == "__main__":
    main()
