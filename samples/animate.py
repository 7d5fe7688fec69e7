#!/usr/bin/env python
"""Animated demo: orbiting camera + spinning sphere over several frames.

Exercises the per-frame streaming path the reference's host drives
(SetViewPerspective + SetInstanceDescription every frame, main.cpp
WM_PAINT), motion vectors (previousTransform), temporal accumulation,
the denoiser, and motion blur. Writes numbered PNGs.

    python samples/animate.py --frames 8 --out /tmp/anim
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--out", default="/tmp/rt64tpu_anim")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--motion-blur", type=float, default=0.3)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from rt64tpu import descriptors as d
    from rt64tpu.ops import math3d
    from rt64tpu.utils.assets import write_png
    from rt64tpu.utils.testscenes import build_sample_scene, hud_triangle

    dev, scene, view = build_sample_scene(
        width=args.width, height=args.height, denoiser=True
    )
    hud_triangle(scene, dev, color=(1.0, 0.2, 0.1, 0.8))
    sphere = scene.instances[0]
    vd = view.desc
    vd.motion_blur_strength = args.motion_blur
    view.set_description(vd)

    os.makedirs(args.out, exist_ok=True)
    prev_tf = None
    for f in range(args.frames):
        angle = f * 0.12
        eye = (9.0 * np.sin(angle * 0.5), 3.0, 9.0 * np.cos(angle * 0.5))
        vm = math3d.look_at_rh(eye, (0.0, 1.2, 0.0), (0.0, 1.0, 0.0))
        view.set_perspective(vm, 45.0 * np.pi / 180.0, 0.1, 1000.0, True)

        tf = math3d.rotation_y(angle * 2.0) @ math3d.translation(0.0, 1.5, 0.0)
        desc = sphere.desc
        desc.previous_transform = prev_tf if prev_tf is not None else tf
        desc.transform = tf
        sphere.set_description(desc)
        prev_tf = tf

        dev.draw()
        path = os.path.join(args.out, f"frame_{f:03d}.png")
        write_png(path, view.framebuffer())
        print("wrote", path, f"({dev.last_frame_time_ms:.1f} ms)")


if __name__ == "__main__":
    main()
