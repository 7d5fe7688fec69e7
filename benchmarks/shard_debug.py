#!/usr/bin/env python
"""Isolate which pipeline feature diverges between sharded and
single-device rendering (dryrun parity debugging). Run with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import numpy as np
from dataclasses import replace
from functools import partial

from rt64tpu.parallel import tiling
from rt64tpu.pipeline import framegraph as fg
from rt64tpu.utils.testscenes import build_sample_scene


def run(name, gi, refl, glass, k_primary=None, n_devices=4, refr=None,
        alpha_cap=None, boost=None):
    devices = jax.devices()[:n_devices]
    mesh = tiling.make_mesh(devices)
    height = 8 * n_devices
    dev, scene, view = build_sample_scene(
        width=64, height=height, gi_samples=gi, with_glass=glass
    )
    view.max_reflections = refl
    view.update()
    r = view._renderer
    cfg = r._config()
    if k_primary is not None:
        cfg = replace(cfg, k_primary=k_primary)
    if refr is not None:
        cfg = replace(cfg, refraction_enabled=refr)
    if alpha_cap is not None:
        cfg = replace(cfg, alpha_cap=alpha_cap)
    if boost is not None:
        cfg = replace(cfg, alpha_shade_boost=boost)
    gp = r._global_params(cfg)
    bg = r._background_planes(cfg)
    hist0 = lambda: fg.History.zeros(cfg.rt_height, cfg.rt_width)

    single = jax.jit(partial(fg.render_frame, cfg=cfg))(
        r._sb, gp, hist0(), r.bn_table, bg
    )
    fn = tiling.sharded_render(mesh, cfg)
    multi = fn(r._sb, gp, tiling.replicate_history(mesh, hist0()),
               r.bn_table, bg)
    a = np.asarray(jax.device_get(single.image))
    b = np.asarray(jax.device_get(multi.image))
    d = np.abs(a - b)
    # Which rows differ? (band boundaries vs whole bands)
    row_max = d.max(axis=(0, 2))
    bad_rows = np.where(row_max > 1e-3)[0]
    col_max = d.max(axis=(0, 1))
    bad_cols = np.where(col_max > 1e-3)[0]
    print(
        f"{name}: mean|d|={d.mean():.2e} max={d.max():.3f} "
        f"frac>{1e-3}={(d > 1e-3).mean():.4f} bad_rows={bad_rows[:20]} "
        f"bad_cols={bad_cols[:16]} "
        f"dropped single={int(np.asarray(single.alpha_dropped))} "
        f"multi={int(np.asarray(multi.alpha_dropped))}"
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cases = {
        "base": dict(gi=0, refl=0, glass=False),
        "gi": dict(gi=1, refl=0, glass=False),
        "refl": dict(gi=0, refl=2, glass=False),
        "glass": dict(gi=0, refl=0, glass=True),
        "glassnorefr": dict(gi=0, refl=0, glass=True, refr=False),
        "glassbig": dict(gi=0, refl=0, glass=True, alpha_cap=1024),
        "glassboost": dict(gi=0, refl=0, glass=True, boost=16),
        "full": dict(gi=1, refl=2, glass=True),
    }
    for name, kw in cases.items():
        if which != "all" and which != name:
            continue
        run(name, **kw)
