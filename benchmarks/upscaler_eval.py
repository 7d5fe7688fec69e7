#!/usr/bin/env python
"""Honest learned-upscaler evaluation on HELD-OUT scenes.

The training corpus (models/train_upscaler.py) renders camera orbits of
the stock sample scene and the castle analog. This evaluates on inputs
the net never saw — (a) the with_glass sample variant (refraction,
lit-transparent alpha, new geometry) and (b) the castle from a strongly
off-orbit camera — through the PRODUCTION paths (the same view-level
upscaler slots a host ships with), and reports SSIM/PSNR of each
backend's final frame against a CONVERGED native-resolution render:

  bilinear  — internal-res render, bilinear blit (the no-model floor)
  temporal  — UPSCALER_FSR (hand-written temporal accumulator)
  learned   — UPSCALER_DLSS (the CNN; jittered like the FSR path)

Protocol (round-4 upgrade): the native target renders --converge
frames (temporal paths reach their static-scene fixed point; history
length saturates at 64), and each backend is measured at several
jitter-phase offsets past convergence — mean +/- spread makes the
backend ranking load-bearing instead of single-sample.

Usage: python benchmarks/upscaler_eval.py [--width 640 --height 480]
"""

import argparse
import dataclasses
import json
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


def build_scene(scene_key, width, height, upscaler, mode):
    import rt64tpu
    from rt64tpu import descriptors as d
    from rt64tpu.ops import math3d

    if scene_key == "glass":
        from rt64tpu.utils.testscenes import build_sample_scene

        dev, scene, view = build_sample_scene(
            width=width, height=height, di_samples=1, gi_samples=1,
            with_glass=True, sphere_reflection=0.5,
        )
        view.max_reflections = 2
    else:
        assert scene_key == "castle_offorbit", scene_key
        from rt64tpu.utils.castle_scene import build_castle_scene

        dev, scene, view = build_castle_scene(
            width=width, height=height, di_samples=1, gi_samples=1,
        )
        # Low, close-in viewpoint outside the training distribution
        # (train_upscaler castle orbits: dist 40-80, height 8-20; this
        # is dist ~21 at height 2.5).
        vm = math3d.look_at_rh(
            (14.0, 2.5, 16.0), (-2.0, 3.0, -8.0), (0.0, 1.0, 0.0)
        )
        view.set_perspective(vm, 45.0 * np.pi / 180.0, 0.1, 1000.0, True)
    vd = dataclasses.replace(view.desc, upscaler=upscaler,
                             upscaler_mode=mode)
    view.set_description(vd)
    view.update()
    return dev, scene, view


def frames_at(scene_key, width, height, upscaler, mode, checkpoints):
    """Render through the production loop, grabbing the framebuffer at
    each frame count in `checkpoints` (ascending)."""
    dev, scene, view = build_scene(scene_key, width, height, upscaler,
                                   mode)
    grabbed = []
    done = 0
    for target in checkpoints:
        while done < target:
            dev.draw()
            done += 1
        grabbed.append(
            np.asarray(view.framebuffer()[..., :3], np.float64) / 255.0
        )
    return grabbed, view._renderer._config()


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse <= 1e-12 else 10.0 * np.log10(1.0 / mse)


def main():
    from rt64tpu import descriptors as d
    from rt64tpu.ops import filters
    from rt64tpu.utils.ssim import ssim
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--converge", type=int, default=64,
                    help="frames before the first measurement")
    ap.add_argument("--offsets", type=int, nargs="+", default=[0, 5, 11],
                    help="extra-frame offsets past convergence (one "
                         "measurement each; jitter phase + blue-noise "
                         "frame differ per offset)")
    ap.add_argument("--scenes", nargs="+",
                    default=["glass", "castle_offorbit"])
    args = ap.parse_args()
    w, h = args.width, args.height
    checkpoints = [args.converge + o for o in args.offsets]

    mode = d.UPSCALER_MODE_PERFORMANCE  # 1/2 scale: the config-5 slot
    report = {"display": f"{w}x{h}",
              "protocol": f"native converged {args.converge} frames; "
                          f"measured at offsets {args.offsets}"}
    for scene_key in args.scenes:
        natives, _ = frames_at(scene_key, w, h, d.UPSCALER_OFF,
                               d.UPSCALER_MODE_AUTO, checkpoints)
        # The converged native target: the LAST checkpoint (deepest
        # accumulation); also report native self-variance across
        # offsets — the noise floor of the protocol itself.
        native = natives[-1]
        self_var = [float(ssim(f, native, data_range=1.0))
                    for f in natives[:-1]]

        rows = {}
        learned, cfg = frames_at(scene_key, w, h, d.UPSCALER_DLSS, mode,
                                 checkpoints)
        rows["learned (DLSS slot)"] = learned
        temporal, _ = frames_at(scene_key, w, h, d.UPSCALER_FSR, mode,
                                checkpoints)
        rows["temporal (FSR slot)"] = temporal

        los, _ = frames_at(scene_key, cfg.rt_width, cfg.rt_height,
                           d.UPSCALER_OFF, d.UPSCALER_MODE_AUTO,
                           checkpoints)
        rows["bilinear"] = [
            np.moveaxis(np.asarray(filters.bilinear_resize(
                jnp.asarray(np.moveaxis(lo, -1, 0), jnp.float32), h, w
            )), 0, -1)
            for lo in los
        ]

        sc = {"internal": f"{cfg.rt_width}x{cfg.rt_height}",
              "native_self_ssim_floor": [round(v, 4) for v in self_var]}
        for name, imgs in rows.items():
            ss = [float(ssim(img, native, data_range=1.0))
                  for img in imgs]
            ps = [psnr(img, native) for img in imgs]
            sc[name] = {
                "ssim_mean": round(float(np.mean(ss)), 4),
                "ssim_spread": round(float(np.max(ss) - np.min(ss)), 4),
                "psnr_mean": round(float(np.mean(ps)), 2),
            }
        report[scene_key] = sc
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
