#!/usr/bin/env python
"""Per-stage device-side timing of the frame graph on the castle scene.

Each stage is timed amortized inside a lax.scan (utils/profiling.stage_bench)
so dispatch/tunnel latency washes out. The carry chains a scalar through
every stage invocation to defeat DCE while keeping inputs resident.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
def _enable_cache():
    # This jax version ignores JAX_COMPILATION_CACHE_DIR set in-process;
    # the config update is the reliable path.
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))


_enable_cache()

import jax
import jax.numpy as jnp

from rt64tpu.ops import tracer, shading as shade_ops, lighting
from rt64tpu.pipeline import framegraph as fg
from rt64tpu.utils.profiling import stage_bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--scene", choices=["sample", "castle"], default="castle")
    ap.add_argument("--gi", type=int, default=0)
    ap.add_argument("--reflections", type=int, default=0)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    if args.scene == "castle":
        from rt64tpu.utils.castle_scene import build_castle_scene
        dev, scene, view = build_castle_scene(
            width=args.width, height=args.height, gi_samples=args.gi)
    else:
        from rt64tpu.utils.testscenes import build_sample_scene
        dev, scene, view = build_sample_scene(
            width=args.width, height=args.height, gi_samples=args.gi)
    view.max_reflections = args.reflections
    view.update()
    r = view._renderer
    cfg = r._config()
    gp = r._global_params(cfg)
    hist = fg.History.zeros(cfg.rt_height, cfg.rt_width)
    bg = r._background_planes(cfg)
    sb = r._sb
    bn = r.bn_table

    n = cfg.rt_height * cfg.rt_width
    print(f"scene={args.scene} {args.width}x{args.height} n={n} "
          f"tris={r.packer.triangle_count} alpha={r.packer.alpha_triangle_count} "
          f"pallas={cfg.use_pallas_tracer} k_primary={cfg.k_primary}")

    # Shared precomputed inputs (not timed).
    tri_rows, rows_t = shade_ops.build_tri_rows(sb)
    trace_scene = fg.make_trace_scene(sb, rows_t, cfg.alpha_cap)
    pix, origins, dirs = fg.primary_rays(cfg, gp)
    noise_rand = fg._noise_rand(cfg, gp, pix)
    t_min = jnp.full((n,), tracer.RAY_MIN_DISTANCE)
    t_max = jnp.full((n,), tracer.RAY_MAX_DISTANCE)
    opaque_fn = fg._opaque_fn(cfg)
    shadow_fn = fg._shadow_fn(cfg)

    tri_rows, rows_t, pix, origins, dirs, noise_rand = jax.block_until_ready(
        jax.jit(lambda: (tri_rows, rows_t, pix, origins, dirs, noise_rand))()
    )

    def tweak(c):
        # Perturb t_min by a tiny epsilon that depends on the carry so
        # XLA cannot hoist the stage out of the scan.
        return t_min + c * 1e-30

    stages = {}

    def bench(name, step):
        ms = stage_bench(name, step, jnp.float32(0.0), iters=args.iters, reps=3)
        stages[name] = ms
        print(f"{name:<26}{ms:>9.2f} ms")

    bench("build_tri_rows", lambda c: shade_ops.build_tri_rows(sb)[1].sum() * 0 + c + 1)

    def opaque_step(c):
        t, tri, *rest = (opaque_fn or tracer.trace_opaque)(
            origins, dirs, tweak(c), t_max, trace_scene,
            cull_backface=True, chunk=cfg.tri_chunk)
        return c + t.sum() * 0 + tri.sum() * 0

    bench("primary_opaque_trace", opaque_step)

    def alpha_step(c):
        t_a, tri_a, uv_a, b_a, drop = tracer.trace_alpha(
            origins, dirs, tweak(c), t_max, trace_scene, cfg.k_primary,
            cull_backface=True,
            compact_capacity=max(1024, n // 4))
        return c + t_a.sum() * 0 + tri_a.sum() * 0 + uv_a.sum() * 0 + 1

    bench("primary_alpha_trace", alpha_step)

    def full_trace_step(c):
        hits = tracer.trace(origins, dirs, tweak(c), t_max, trace_scene,
                            k_alpha=cfg.k_primary, chunk=cfg.tri_chunk,
                            opaque_fn=opaque_fn)
        return c + hits.t_op.sum() * 0 + 1

    bench("primary_trace_full", full_trace_step)

    hits = jax.jit(lambda: tracer.trace(
        origins, dirs, t_min, t_max, trace_scene, k_alpha=cfg.k_primary,
        chunk=cfg.tri_chunk, opaque_fn=opaque_fn))()
    hits = jax.block_until_ready(hits)

    def shade_step(c):
        sh = shade_ops.shade_hits(
            sb, tri_rows, dirs, hits.tri_op, hits.uv_op[:, 0] + c * 0,
            hits.uv_op[:, 1], noise_rand)
        return c + sh.color.sum() * 0 + 1

    bench("shade_opaque_slot", shade_step)

    def primary_pass_step(c):
        g2, _, _ = fg.primary_pass(
            sb, gp, cfg, origins, dirs, tweak(c), t_max,
            jnp.zeros((3, n)), tri_rows, trace_scene, pix, bn, noise_rand)
        return c + g2.diffuse_rgb.sum() * 0 + 1

    bench("primary_pass_fused", primary_pass_step)

    g, _, _ = jax.block_until_ready(jax.jit(
        lambda: fg.primary_pass(
            sb, gp, cfg, origins, dirs, t_min, t_max,
            jnp.zeros((3, n)), tri_rows, trace_scene, pix, bn, noise_rand))())

    lpos = sb.lights[0, 0:3]
    ldir = lpos[:, None] - g.position
    ldist = jnp.sqrt((ldir * ldir).sum(0))
    ldirn = ldir / jnp.maximum(ldist, 1e-9)[None]

    def shadow_step(c):
        f, _ = lighting.trace_shadow_factor(
            sb, tri_rows, trace_scene, g.position, ldirn,
            t_min + c * 0, ldist, noise_rand, cfg.k_shadow,
            opaque_fn=shadow_fn)
        return c + f.sum() * 0 + 1

    bench("shadow_trace_1light", shadow_step)

    def direct_step(c):
        ctx = lighting.ctx_from_rows(g.row, g.instance >= 0)
        plan = lighting.plan_lights(
            sb, pix, bn, gp.frame_count, g.view_dir, g.position,
            g.normal, g.specular, ctx, cfg.max_lights, cfg.di_samples,
            noise_rand + c * 0)
        (f,), _ = lighting.trace_plans(
            [plan], sb, tri_rows, trace_scene, cfg.k_shadow,
            opaque_fn=shadow_fn)
        acc = fg.direct_pass(cfg, gp, g, hist, ctx,
                             lighting.finish_lights(plan, f))
        return c + acc[0].sum() * 0 + 1

    bench("direct_pass", direct_step)

    if args.gi > 0:
        def indirect_step(c):
            acc, _ = fg.indirect_pass(
                sb, tri_rows, trace_scene, cfg, gp, g, hist, pix, bn,
                noise_rand + c * 0, bg)
            return c + acc[0].sum() * 0 + 1

        bench("indirect_pass", indirect_step)

    def frame_step(c):
        out = fg.render_frame(sb, gp, hist, bn, bg, cfg=cfg)
        return c + out.image.sum() * 0 + 1

    bench("full_frame", frame_step)

    total = stages["full_frame"]
    print(f"\nfull frame: {total:.2f} ms = {1000.0/total:.1f} fps")


if __name__ == "__main__":
    main()
