#!/usr/bin/env python
"""Whole-frame op-level profile: trace one jitted castle frame with
jax.profiler and aggregate XLA op durations from the xplane proto.

Prints the top ops by total self-time and a category rollup — the
fastest way to see where a frame's milliseconds go (vs per-stage
compiles in passbench.py)."""

import argparse
import collections
import glob
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

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--scene", choices=["sample", "castle"], default="castle")
    ap.add_argument("--gi", type=int, default=0)
    ap.add_argument("--reflections", type=int, default=0)
    ap.add_argument("--upscaler", type=int, default=0)
    ap.add_argument("--mode", type=int, default=0,
                    help="upscaler_mode (descriptors: 2=performance)")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/frameprof")
    args = ap.parse_args()

    if args.scene == "castle":
        from rt64tpu.utils.castle_scene import build_castle_scene

        dev, scene, view = build_castle_scene(
            width=args.width, height=args.height, gi_samples=args.gi
        )
    else:
        from rt64tpu.utils.testscenes import build_sample_scene

        dev, scene, view = build_sample_scene(
            width=args.width, height=args.height, gi_samples=args.gi
        )
    view.max_reflections = args.reflections
    if args.upscaler:
        view.desc.upscaler = args.upscaler
        if args.mode:
            view.desc.upscaler_mode = args.mode
    view.update()
    r = view._renderer
    cfg = r._config()
    gp = r._global_params(cfg)
    from rt64tpu.pipeline import framegraph as fg

    hist = fg.History.zeros(cfg.rt_height, cfg.rt_width)
    bg = r._background_planes(cfg)
    sb = r._sb

    print(
        f"scene={args.scene} {args.width}x{args.height} "
        f"rt={cfg.rt_width}x{cfg.rt_height} tris={r.packer.triangle_count} "
        f"gi={cfg.gi_samples} refl={cfg.max_reflections}"
    )

    fn = jax.jit(lambda sb, gp, hist, bn, bg: fg.render_frame(
        sb, gp, hist, bn, bg, cfg=cfg))

    # Warm up (compile) with a real sync (axon: block_until_ready can lie).
    out = fn(sb, gp, hist, r.bn_table, bg)
    _ = float(out.image.sum())

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        for _ in range(args.frames):
            out = fn(sb, gp, out.history, r.bn_table, bg)
        _ = float(out.image.sum())

    files = sorted(
        glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                  recursive=True),
        key=os.path.getmtime,
    )
    assert files, "no xplane written"
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_metadata = plane.event_metadata
        stats_meta = plane.stat_metadata
        by_op = collections.Counter()
        op_n = collections.Counter()
        by_cat = collections.Counter()
        by_src = collections.Counter()
        src_n = collections.Counter()
        src_bytes = collections.Counter()
        cat_n = collections.Counter()
        module_total = 0.0
        for line in plane.lines:
            if line.name == "XLA Modules":
                for ev in line.events:
                    module_total += ev.duration_ps / 1e9
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = ev_metadata[ev.metadata_id]
                ms = ev.duration_ps / 1e9
                name = md.name
                cat = None
                src = None
                nbytes = 0
                for st in md.stats:
                    sm = stats_meta[st.metadata_id]
                    if sm.name in ("equation", "hlo_category"):
                        cat = st.str_value or None
                    elif sm.name == "source":
                        src = st.str_value or None
                    elif sm.name == "bytes_accessed":
                        nbytes = st.uint64_value
                by_op[name] += ms
                op_n[name] += 1
                by_cat[cat or "?"] += ms
                cat_n[cat or "?"] += 1
                skey = f"{src or '?':<46} [{cat or '?'}]"
                by_src[skey] += ms
                src_n[skey] += 1
                src_bytes[skey] += nbytes
        if not by_op:
            continue
        print(f"\n=== plane {plane.name} ===")
        print(f"XLA Modules total: {module_total:.2f} ms "
              f"({module_total/max(args.frames,1):.2f} ms/frame)")
        print(f"\nby category (ms over {args.frames} frames):")
        for cat, ms in by_cat.most_common(20):
            n = cat_n[cat]
            print(f"  {cat:<30}{ms:>10.2f}  n={n:<6} "
                  f"avg={1000.0 * ms / max(n, 1):.1f}us")
        print(f"\ntop {args.top} source sites (ms | n | GB over "
              f"{args.frames} frames):")
        for skey, ms in by_src.most_common(args.top):
            gb = src_bytes[skey] / 1e9
            print(f"  {ms:>9.2f}  n={src_n[skey]:<5} {gb:>7.2f}GB  {skey}")
        print(f"\ntop {args.top} ops:")
        for name, ms in by_op.most_common(args.top):
            print(f"  {ms:>9.2f}  n={op_n[name]:<5} {name[:110]}")


if __name__ == "__main__":
    main()
