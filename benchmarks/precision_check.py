#!/usr/bin/env python
"""Numerical audit of the packet kernels ON TPU against the XLA scan
tracer: the Woop intersection matmul runs at Mosaic's DEFAULT dot
precision (bf16 operand rounding), mitigated since round 5 by the
split-operand form (tracer_pallas WS_* layout). This verifies what
that means for the shipped traversal — triangle-id agreement and t
error on the castle primary population (the CPU parity tests run
interpret mode, which is exact f32 and cannot see device-precision
effects).

Run `--assert` to enforce the regression gate (round-4 VERDICT ask #2):
triangle agreement >= 99.9%, hit flips < 0.1%, t rel err p99 < 1e-3.
The same gate runs as a TPU-only pytest (tests/test_precision_tpu.py).
"""

import argparse
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


def castle_primary_population():
    """(scene, origins, dirs, t_min, t_max): the castle primary camera
    rays at the production config-2 internal resolution — built
    directly (no capture-file dependency) so the gate runs anywhere."""
    from rt64tpu.ops import shading as shade_ops
    from rt64tpu.ops import tracer
    from rt64tpu.pipeline import framegraph as fg
    from rt64tpu.utils.castle_scene import build_castle_scene

    dev, scene, view = build_castle_scene(width=640, height=480,
                                          gi_samples=0)
    view.update()
    r = view._renderer
    from dataclasses import replace

    cfg = replace(r._config(), rt_width=512, rt_height=368)
    gp = r._global_params(cfg)
    tri_rows, rows_t = shade_ops.build_tri_rows(r._sb)
    ts = fg.make_trace_scene(r._sb, rows_t, r.packer.alpha_cap)
    pix, origins, dirs = fg.primary_rays(cfg, gp)
    n = dirs.shape[1]
    t_min = jnp.full((n,), tracer.RAY_MIN_DISTANCE)
    t_max = jnp.full((n,), tracer.RAY_MAX_DISTANCE)
    return ts, origins, dirs, t_min, t_max


def audit(scene, o, dd, tmin, tmax):
    """Returns (agreement, flips_to_miss, spurious_hits, rel_errs)."""
    from rt64tpu.ops import tracer as tr
    import rt64tpu.ops.tracer_pallas as tp

    t_ref, tri_ref, _ = jax.jit(
        lambda: tr.trace_opaque(o, dd, tmin, tmax, scene,
                                cull_backface=True, chunk=256)
    )()
    fn = tp.make_opaque_fn()
    t_k, tri_k, _, _ = jax.jit(lambda: fn(o, dd, tmin, tmax, scene))()

    tri_ref = np.asarray(tri_ref)
    tri_k = np.asarray(tri_k)
    t_ref = np.asarray(t_ref)
    t_k = np.asarray(t_k)
    agree = tri_ref == tri_k
    hit_ref = tri_ref >= 0
    both = hit_ref & (tri_k >= 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        rel = np.abs(t_k - t_ref) / np.maximum(np.abs(t_ref), 1e-6)
    return (
        float(agree.mean()),
        int((hit_ref & (tri_k < 0)).sum()),
        int((~hit_ref & (tri_k >= 0)).sum()),
        rel[both & agree],
        int(tri_ref.shape[0]),
        int(hit_ref.sum()),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--assert", dest="gate", action="store_true",
                    help="enforce the precision regression gate")
    args = ap.parse_args()

    if os.path.exists("/tmp/castle_rays.npz"):
        # Captured populations (benchmarks/visitstats.py) when present —
        # the exact rays a rendered frame traced.
        d = np.load("/tmp/castle_rays.npz")
        from rt64tpu.ops import tracer as tr

        scene = tr.TraceScene(
            v0=jnp.asarray(d["v0"]), v1=jnp.asarray(d["v1"]),
            v2=jnp.asarray(d["v2"]),
            valid=jnp.asarray(d["valid"]), alpha=jnp.asarray(d["alpha"]),
            no_cull=jnp.asarray(d["no_cull"]), bias=jnp.asarray(d["bias"]),
            alpha_idx=jnp.zeros((1,), jnp.int32), has_alpha=True,
        )
        pop = (scene, jnp.asarray(d["0_opaque_o"]),
               jnp.asarray(d["0_opaque_d"]),
               jnp.asarray(d["0_opaque_tmin"]),
               jnp.asarray(d["0_opaque_tmax"]))
        src = "captured /tmp/castle_rays.npz"
    else:
        pop = castle_primary_population()
        src = "generated castle primary rays"

    agreement, flips, spurious, rel, n, hits = audit(*pop)
    print(f"population: {src}")
    print(f"rays={n}  tri agreement={agreement:.6f}")
    print(f"hit/miss flips: ref-hit&kernel-miss={flips} "
          f"ref-miss&kernel-hit={spurious}")
    if rel.size:
        print(f"t rel err on agreeing hits: mean={rel.mean():.3e} "
              f"p99={np.percentile(rel, 99):.3e} max={rel.max():.3e}")
    if args.gate:
        assert agreement >= 0.999, f"tri agreement {agreement} < 0.999"
        assert flips <= 0.001 * max(hits, 1), \
            f"{flips} hit->miss flips on {hits} hits"
        assert rel.size and float(np.percentile(rel, 99)) < 1e-3, \
            "t rel err p99 >= 1e-3"
        print("precision gate: PASS")


if __name__ == "__main__":
    main()
