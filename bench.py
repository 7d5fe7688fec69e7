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


def measure(scene_name, width, height, di, gi, reflections, frames, reps):
    """Return fps for one ladder rung (device-side chained frames)."""
    import jax
    from rt64tpu.pipeline import framegraph as fg

    if scene_name == "castle":
        from rt64tpu.utils.castle_scene import build_castle_scene
        dev, scene, view = build_castle_scene(
            width=width, height=height, di_samples=di, gi_samples=gi,
        )
    else:
        from rt64tpu.utils.testscenes import build_sample_scene
        dev, scene, view = build_sample_scene(
            width=width, height=height, di_samples=di, gi_samples=gi,
        )
    view.max_reflections = reflections
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
        h2, means = jax.lax.scan(body, hist, None, length=frames)
        return means

    jf = jax.jit(run_frames, donate_argnums=(2,))
    np.asarray(jf(r._sb, gp, hist, r.bn_table, bg))  # compile+warm
    t0 = time.time()
    for _ in range(reps):
        hist = fg.History.zeros(cfg.rt_height, cfg.rt_width)
        np.asarray(jf(r._sb, gp, hist, r.bn_table, bg))
    dt = (time.time() - t0) / (reps * frames)
    return 1.0 / dt


def rung_mrays(width, height, di, gi, reflections, fps):
    # Ray budget per pixel for this config (SURVEY.md section 6):
    # primary + DI shadows (maxLights-selected, here 1 light scene) +
    # GI (trace + 1-light shadow) + refraction(1+1) + reflections.
    lights = 1
    rays_per_pixel = (
        1
        + di * lights
        + gi * (1 + di)
        + (1 + di)  # refraction + its light
        + reflections
        + 1  # transparent-light shadow
    )
    return width * height * rays_per_pixel * fps / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, choices=sorted(CONFIGS), default=None,
                    help="BASELINE.md ladder rung; default: climb the ladder "
                         "and headline the frontier (first rung under 60 fps)")
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

    if args.config is None and args.scene is None and args.width is None:
        # Ladder mode (the driver's invocation): climb rungs until one
        # misses the 60 fps bar; headline the frontier rung so the
        # recorded metric tracks unsolved work, and carry every
        # measured rung in the "ladder" field.
        ladder = {}
        frontier = None
        for c in sorted(CONFIGS):
            scene_name, w, h, di, gi, refl = CONFIGS[c]
            fps = measure(scene_name, w, h, di, gi, refl,
                          args.frames, args.reps)
            ladder[f"config{c}"] = round(fps, 2)
            frontier = (c, scene_name, w, h, di, gi, refl, fps)
            if fps < args.target_fps:
                break
        c, scene_name, w, h, di, gi, refl, fps = frontier
        mrays = rung_mrays(w, h, di, gi, refl, fps)
        print(json.dumps({
            "metric": f"fps@{w}x{h} (BASELINE frontier config {c}: "
                      f"{scene_name} scene, di={di} gi={gi} refl={refl}; "
                      f"{mrays:.0f} Mrays/s; ladder "
                      + ",".join(f"{k}={v}" for k, v in ladder.items()) + ")",
            "value": round(fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fps / args.target_fps, 3),
            "ladder": ladder,
        }))
        return

    config = args.config if args.config is not None else 1
    c_scene, c_w, c_h, c_di, c_gi, c_refl = CONFIGS[config]
    args.scene = args.scene if args.scene is not None else c_scene
    args.width = args.width if args.width is not None else c_w
    args.height = args.height if args.height is not None else c_h
    args.di = args.di if args.di is not None else c_di
    args.gi = args.gi if args.gi is not None else c_gi
    args.reflections = (args.reflections if args.reflections is not None
                        else c_refl)

    fps = measure(args.scene, args.width, args.height, args.di, args.gi,
                  args.reflections, args.frames, args.reps)
    mrays = rung_mrays(args.width, args.height, args.di, args.gi,
                       args.reflections, fps)
    print(json.dumps({
        "metric": f"fps@{args.width}x{args.height} (BASELINE config {config}: {args.scene} scene, di={args.di} gi={args.gi} refl={args.reflections}; {mrays:.0f} Mrays/s)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / args.target_fps, 3),
    }))


if __name__ == "__main__":
    main()
