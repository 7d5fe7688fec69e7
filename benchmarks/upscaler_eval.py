#!/usr/bin/env python
"""Honest learned-upscaler evaluation on a HELD-OUT scene.

The training corpus (models/train_upscaler.py) renders camera orbits of
the stock sample scene and the castle analog. This evaluates on the
with_glass sample variant — refraction, lit-transparent alpha, and
geometry the net never saw — through the PRODUCTION paths (the same
view-level upscaler slots a host ships with), and reports SSIM/PSNR of
each backend's final frame against a native-resolution render:

  bilinear  — internal-res render, bilinear blit (the no-model floor)
  temporal  — UPSCALER_FSR (hand-written temporal accumulator)
  learned   — UPSCALER_DLSS (the CNN; jittered like the FSR path)

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


def build_heldout(width, height, upscaler, mode):
    import rt64tpu
    from rt64tpu import descriptors as d
    from rt64tpu.utils.testscenes import build_sample_scene

    dev, scene, view = build_sample_scene(
        width=width, height=height, di_samples=1, gi_samples=1,
        with_glass=True, sphere_reflection=0.5,
    )
    view.max_reflections = 2
    vd = dataclasses.replace(view.desc, upscaler=upscaler,
                             upscaler_mode=mode)
    view.set_description(vd)
    view.update()
    return dev, scene, view


def final_frame(width, height, upscaler, mode, frames=8):
    dev, scene, view = build_heldout(width, height, upscaler, mode)
    for _ in range(frames):
        dev.draw()
    img = np.asarray(view.framebuffer()[..., :3], np.float64) / 255.0
    return img, view._renderer._config()


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
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()
    w, h = args.width, args.height

    native, _ = final_frame(w, h, d.UPSCALER_OFF, d.UPSCALER_MODE_AUTO,
                            args.frames)

    # Performance mode (1/2 scale) — the config-5 DLSS-slot setting.
    mode = d.UPSCALER_MODE_PERFORMANCE
    rows = {}

    learned, cfg = final_frame(w, h, d.UPSCALER_DLSS, mode, args.frames)
    rows["learned (DLSS slot)"] = learned

    temporal, _ = final_frame(w, h, d.UPSCALER_FSR, mode, args.frames)
    rows["temporal (FSR slot)"] = temporal

    # Bilinear floor: the same internal resolution, plain blit.
    dev, scene, view = build_heldout(w, h, d.UPSCALER_OFF,
                                     d.UPSCALER_MODE_AUTO)
    # render at the production internal res directly
    lo_dev, lo_scene, lo_view = build_heldout(
        cfg.rt_width, cfg.rt_height, d.UPSCALER_OFF, d.UPSCALER_MODE_AUTO)
    for _ in range(args.frames):
        lo_dev.draw()
    lo = np.asarray(lo_view.framebuffer()[..., :3], np.float64) / 255.0
    bil = np.asarray(
        filters.bilinear_resize(jnp.asarray(np.moveaxis(lo, -1, 0),
                                            jnp.float32), h, w)
    )
    rows["bilinear"] = np.moveaxis(bil, 0, -1)

    out = {"internal": f"{cfg.rt_width}x{cfg.rt_height}",
           "display": f"{w}x{h}", "scene": "sample+glass (held out)"}
    for name, img in rows.items():
        out[name] = {
            "ssim": round(float(ssim(img, native, data_range=1.0)), 4),
            "psnr": round(psnr(img, native), 2),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
