#!/usr/bin/env python
"""Headline benchmark: frames/sec + Mrays/s on the sample scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured fps / 60 (the BASELINE.md target: 60 fps at
1080p-internal on one TPU chip; the config ladder starts at 320x240).

Frames are chained device-side through the donated temporal history
(lax.scan) so remote-dispatch latency does not pollute the number —
this mirrors a production loop where the host only syncs to present.
"""

import argparse
import json
import os
import sys
import time

def _enable_cache():
    # This jax version ignores JAX_COMPILATION_CACHE_DIR set in-process;
    # the config update is the reliable path.
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))


_enable_cache()

import numpy as np


# BASELINE.md config ladder presets (scene, w, h, di, gi, reflections).
CONFIGS = {
    1: ("sample", 320, 240, 1, 0, 0),   # primary + hard shadows
    2: ("castle", 640, 480, 1, 0, 0),   # streamed castle + combiner + DI
    3: ("castle", 1280, 720, 1, 1, 0),  # + 1-bounce GI
    4: ("castle", 1280, 720, 1, 1, 2),  # + reflections/refraction/alpha
    5: ("castle", 1920, 1080, 1, 1, 2), # full pipeline at 1080p
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, choices=sorted(CONFIGS), default=1,
                    help="BASELINE.md ladder config (default: 1, the "
                         "lowest rung currently at vs_baseline >= 1)")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--di", type=int, default=None)
    ap.add_argument("--gi", type=int, default=None)
    ap.add_argument("--reflections", type=int, default=None)
    ap.add_argument("--target-fps", type=float, default=60.0)
    ap.add_argument("--scene", choices=["sample", "castle"], default=None,
                    help="castle = castle-grounds analog (the BASELINE workload)")
    args = ap.parse_args()
    c_scene, c_w, c_h, c_di, c_gi, c_refl = CONFIGS[args.config]
    args.scene = args.scene if args.scene is not None else c_scene
    args.width = args.width if args.width is not None else c_w
    args.height = args.height if args.height is not None else c_h
    args.di = args.di if args.di is not None else c_di
    args.gi = args.gi if args.gi is not None else c_gi
    args.reflections = (args.reflections if args.reflections is not None
                        else c_refl)

    import jax
    from functools import partial
    from rt64tpu.pipeline import framegraph as fg

    if args.scene == "castle":
        from rt64tpu.utils.castle_scene import build_castle_scene
        dev, scene, view = build_castle_scene(
            width=args.width, height=args.height, di_samples=args.di,
            gi_samples=args.gi,
        )
    else:
        from rt64tpu.utils.testscenes import build_sample_scene
        dev, scene, view = build_sample_scene(
            width=args.width, height=args.height, di_samples=args.di,
            gi_samples=args.gi,
        )
    view.max_reflections = args.reflections
    view.update()
    r = view._renderer
    cfg = r._config()
    gp = r._global_params(cfg)
    hist = fg.History.zeros(cfg.rt_height, cfg.rt_width)
    bg = r._background_planes(cfg)

    def run_frames(sb, gp, hist, bn, bg):
        def body(h, _):
            o = fg.render_frame(sb, gp, h, bn, bg, cfg=cfg)
            return o.history, o.image.mean()
        h2, means = jax.lax.scan(body, hist, None, length=args.frames)
        return means

    jf = jax.jit(run_frames, donate_argnums=(2,))
    means = np.asarray(jf(r._sb, gp, hist, r.bn_table, bg))  # compile+warm
    t0 = time.time()
    for _ in range(args.reps):
        hist = fg.History.zeros(cfg.rt_height, cfg.rt_width)
        means = np.asarray(jf(r._sb, gp, hist, r.bn_table, bg))
    dt = (time.time() - t0) / (args.reps * args.frames)
    fps = 1.0 / dt

    # Ray budget per pixel for this config (SURVEY.md section 6):
    # primary + DI shadows (maxLights-selected, here 1 light scene) +
    # GI (trace + 1-light shadow) + refraction(1+1) + reflections.
    n = args.width * args.height
    lights = 1
    rays_per_pixel = (
        1
        + args.di * lights
        + args.gi * (1 + args.di)
        + (1 + args.di)  # refraction + its light
        + args.reflections
        + 1  # transparent-light shadow
    )
    mrays = n * rays_per_pixel * fps / 1e6

    print(json.dumps({
        "metric": f"fps@{args.width}x{args.height} (BASELINE config {args.config}: {args.scene} scene, di={args.di} gi={args.gi} refl={args.reflections}; {mrays:.0f} Mrays/s)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / args.target_fps, 3),
    }))


if __name__ == "__main__":
    main()
