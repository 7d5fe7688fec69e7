#!/usr/bin/env python
"""Dump the compiled castle-frame HLO and list every gather/scatter op
with its shape and JAX source attribution (metadata op_name/source_file),
to target gather-consolidation work."""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--gi", type=int, default=0)
    ap.add_argument("--reflections", type=int, default=0)
    ap.add_argument("--pattern", default="gather")
    ap.add_argument("--upscaler", type=int, default=0)
    args = ap.parse_args()

    from rt64tpu.utils.castle_scene import build_castle_scene
    from rt64tpu.pipeline import framegraph as fg

    dev, scene, view = build_castle_scene(
        width=args.width, height=args.height, gi_samples=args.gi)
    view.max_reflections = args.reflections
    if args.upscaler:
        view.desc.upscaler = args.upscaler
    view.update()
    r = view._renderer
    cfg = r._config()
    gp = r._global_params(cfg)
    hist = fg.History.zeros(cfg.rt_height, cfg.rt_width)
    bg = r._background_planes(cfg)
    sb = r._sb

    fn = jax.jit(lambda sb, gp, hist, bn, bg: fg.render_frame(
        sb, gp, hist, bn, bg, cfg=cfg))
    lowered = fn.lower(sb, gp, hist, r.bn_table, bg)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = "/tmp/castle_frame.hlo"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out} ({len(txt)} bytes)")

    pat = re.compile(r"^\s*(\S+) = (\S+) " + args.pattern + r"\(")
    meta = re.compile(r'metadata={op_name="([^"]*)"'
                      r'(?:, source_file="([^"]*)", source_line=(\d+))?')
    for line in txt.splitlines():
        if f" {args.pattern}(" not in line and not line.strip().startswith(
                tuple()):
            continue
        m = pat.match(line)
        if not m:
            continue
        name, shape = m.groups()
        mm = meta.search(line)
        src = ""
        if mm:
            op_name = mm.group(1)
            sf = mm.group(2) or ""
            sl = mm.group(3) or ""
            src = f"{op_name[-90:]} @ {os.path.basename(sf)}:{sl}"
        print(f"{shape:<46} {name:<22} {src}")


if __name__ == "__main__":
    main()
