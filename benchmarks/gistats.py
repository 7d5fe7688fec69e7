#!/usr/bin/env python
"""GI-ray cluster-visit statistics: how badly do incoherent cosine-
hemisphere rays defeat the per-block packet culling, and how much
would direction-octant regrouping recover?"""

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

from rt64tpu.pipeline import framegraph as fg
from rt64tpu.ops import bluenoise, tracer, shading
from rt64tpu.ops import tracer_pallas as tp


def stats(name, origins, dirs, t_min, t_max, lo, hi):
    visits, counts, entry = tp.block_visit_lists(
        origins, dirs, t_min, t_max, lo, hi, tp.BLOCK_RAYS
    )
    c = np.asarray(counts)
    nc = lo.shape[1]
    print(
        f"{name}: blocks={c.size} nc={nc} visits mean={c.mean():.1f} "
        f"p50={np.percentile(c, 50):.0f} p90={np.percentile(c, 90):.0f} "
        f"max={c.max()} total={c.sum()}"
    )
    return c.sum()


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=552)
    args = ap.parse_args()

    from rt64tpu.utils.castle_scene import build_castle_scene

    dev, scene, view = build_castle_scene(
        width=args.width, height=args.height, gi_samples=1
    )
    view.update()
    r = view._renderer
    cfg = r._config()
    gp = r._global_params(cfg)
    hist = fg.History.zeros(cfg.rt_height, cfg.rt_width)
    bg = r._background_planes(cfg)
    out = jax.jit(lambda *a: fg.render_frame(*a, cfg=cfg))(
        r._sb, gp, hist, r.bn_table, bg
    )
    g = out.gbuffers
    sb = r._sb
    tri_rows, rows_t = shading.build_tri_rows(sb)
    ts = fg.make_trace_scene(sb, rows_t, cfg.alpha_cap)
    _, lo, hi = tp.build_cluster_data(ts)

    n = g.instance.shape[0]
    pix = fg._pixel_grid(cfg)
    bn = bluenoise.get_blue_noise(r.bn_table, pix, gp.frame_count)
    normal = jnp.asarray(g.normal)
    gi_dirs = fg._cos_hemisphere(bn[..., 0], bn[..., 1], normal)
    active = jnp.asarray(g.instance) >= 0
    t_min = jnp.full((n,), tracer.RAY_MIN_DISTANCE)
    t_max = jnp.where(active, tracer.RAY_MAX_DISTANCE, -1.0)

    # Primary rays for comparison.
    _, p_o, p_d = fg.primary_rays(cfg, gp)
    p_tmax = jnp.full((n,), tracer.RAY_MAX_DISTANCE)
    total_p = stats("primary", p_o, p_d, t_min, p_tmax, lo, hi)

    origins = jnp.asarray(g.position)
    total_gi = stats("gi", origins, gi_dirs, t_min, t_max, lo, hi)

    # Octant-regrouped GI rays: stable-sort ray index by direction
    # octant so blocks hold same-octant rays.
    oct_key = (
        (gi_dirs[0] >= 0).astype(jnp.int32)
        + 2 * (gi_dirs[1] >= 0).astype(jnp.int32)
        + 4 * (gi_dirs[2] >= 0).astype(jnp.int32)
    )
    order = jnp.argsort(oct_key, stable=True)
    total_o = stats(
        "gi-octant", origins[:, order], gi_dirs[:, order], t_min[order],
        t_max[order], lo, hi,
    )

    # Finer: octant + quantized dominant-axis cell (4x4).
    ad = jnp.abs(gi_dirs)
    u = jnp.clip((gi_dirs[0] / jnp.maximum(ad.max(0), 1e-6) * 0.5 + 0.5) * 4,
                 0, 3).astype(jnp.int32)
    v = jnp.clip((gi_dirs[1] / jnp.maximum(ad.max(0), 1e-6) * 0.5 + 0.5) * 4,
                 0, 3).astype(jnp.int32)
    fine = oct_key * 16 + u * 4 + v
    order2 = jnp.argsort(fine, stable=True)
    total_f = stats(
        "gi-fine", origins[:, order2], gi_dirs[:, order2], t_min[order2],
        t_max[order2], lo, hi,
    )
    print(
        f"octant/unsorted = {total_o / total_gi:.2f}, "
        f"fine/unsorted = {total_f / total_gi:.2f}, "
        f"gi/primary = {total_gi / total_p:.2f}"
    )


if __name__ == "__main__":
    main()
