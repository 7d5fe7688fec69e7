"""Pallas packet-tracer parity vs the XLA scan tracer.

Runs the kernels in interpret mode (CPU) on randomized scenes: the
ordered, early-exiting traversal must match tracer.trace_opaque /
trace_shadow exactly (same closest hit, same occlusion verdicts),
because the Pallas path drops in through the opaque_fn hook
(rt64_device.cpp's DXR dispatch analog; see ops/tracer_pallas.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt64tpu.ops import tracer
from rt64tpu.ops import tracer_pallas as tp


def _random_scene(rng, t_total=256, alpha_frac=0.1, bias_frac=0.2):
    v0 = rng.uniform(-10, 10, (3, t_total)).astype(np.float32)
    v1 = v0 + rng.uniform(-3, 3, (3, t_total)).astype(np.float32)
    v2 = v0 + rng.uniform(-3, 3, (3, t_total)).astype(np.float32)
    valid = rng.uniform(size=t_total) > 0.05
    alpha = (rng.uniform(size=t_total) < alpha_frac) & valid
    no_cull = rng.uniform(size=t_total) < 0.5
    bias = np.where(
        rng.uniform(size=t_total) < bias_frac,
        rng.uniform(0, 2, t_total), 0.0,
    ).astype(np.float32)
    return tracer.TraceScene(
        v0=jnp.asarray(v0), v1=jnp.asarray(v1), v2=jnp.asarray(v2),
        valid=jnp.asarray(valid), alpha=jnp.asarray(alpha),
        no_cull=jnp.asarray(no_cull), bias=jnp.asarray(bias),
        alpha_idx=tracer.compact_alpha(
            jnp.asarray(valid), jnp.asarray(alpha), 64
        ),
    )


def _random_rays(rng, n=1024, spread=1.0):
    origins = rng.uniform(-15, 15, (3, n)).astype(np.float32)
    dirs = rng.normal(size=(3, n)).astype(np.float32) * spread
    t_min = np.zeros(n, np.float32)
    t_max = np.full(n, 1e5, np.float32)
    return (jnp.asarray(origins), jnp.asarray(dirs),
            jnp.asarray(t_min), jnp.asarray(t_max))


@pytest.mark.parametrize("cull", [True, False])
@pytest.mark.parametrize("seed", [0, 1])
def test_opaque_parity(seed, cull):
    rng = np.random.default_rng(seed)
    scene = _random_scene(rng)
    origins, dirs, t_min, t_max = _random_rays(rng)

    t_ref, tri_ref, uv_ref = jax.jit(
        lambda: tracer.trace_opaque(
            origins, dirs, t_min, t_max, scene, cull_backface=cull,
            chunk=128,
        )
    )()
    fn = tp.make_opaque_fn(interpret=True)
    t_k, tri_k, uv_k, bias_k = jax.jit(
        lambda: fn(origins, dirs, t_min, t_max, scene, cull_backface=cull)
    )()

    np.testing.assert_array_equal(np.asarray(tri_ref), np.asarray(tri_k))
    hit = np.asarray(tri_ref) >= 0
    # The kernel intersects via the Woop unit-triangle transform
    # (t = -s_z/r_z) — algebraically identical to MT but rounded
    # differently; measured max rel deviation ~3e-5 on these scenes.
    np.testing.assert_allclose(
        np.asarray(t_ref)[hit], np.asarray(t_k)[hit], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(uv_ref)[hit], np.asarray(uv_k)[hit], rtol=1e-3, atol=1e-4
    )
    # The kernel-carried bias must equal the winner's scene bias (the
    # gather it replaces).
    bias_ref = np.asarray(scene.bias)[np.maximum(np.asarray(tri_ref), 0)]
    np.testing.assert_allclose(
        bias_ref[hit], np.asarray(bias_k)[hit], rtol=1e-6, atol=1e-6
    )


def test_opaque_partial_block():
    """Ray counts that are not a BLOCK_RAYS multiple get padded."""
    rng = np.random.default_rng(7)
    scene = _random_scene(rng)
    origins, dirs, t_min, t_max = _random_rays(rng, n=700)
    t_ref, tri_ref, _ = jax.jit(
        lambda: tracer.trace_opaque(
            origins, dirs, t_min, t_max, scene, chunk=128
        )
    )()
    fn = tp.make_opaque_fn(interpret=True)
    t_k, tri_k, _, _ = jax.jit(
        lambda: fn(origins, dirs, t_min, t_max, scene)
    )()
    np.testing.assert_array_equal(np.asarray(tri_ref), np.asarray(tri_k))


@pytest.mark.parametrize("seed", [0, 3])
def test_shadow_parity(seed):
    rng = np.random.default_rng(seed)
    scene = _random_scene(rng)
    origins, dirs, t_min, t_max = _random_rays(rng)
    # Short shadow rays exercise the t_max early-out.
    t_max = jnp.asarray(rng.uniform(1.0, 30.0, origins.shape[1]).astype(np.float32))

    t_ref, tri_ref, _ = jax.jit(
        lambda: tracer.trace_opaque(
            origins, dirs, t_min, t_max, scene, cull_backface=False,
            chunk=128,
        )
    )()
    # The XLA path reports the closest hit; occlusion = any hit. With
    # bias the kernel's verdict must match "any opaque hit in range".
    blocked_ref = np.asarray(tri_ref) >= 0

    fn = tp.make_shadow_opaque_fn(interpret=True)
    t_k, tri_k, _, _ = jax.jit(
        lambda: fn(origins, dirs, t_min, t_max, scene)
    )()
    np.testing.assert_array_equal(blocked_ref, np.asarray(tri_k) >= 0)


def test_visit_lists_front_to_back():
    rng = np.random.default_rng(5)
    scene = _random_scene(rng)
    origins, dirs, t_min, t_max = _random_rays(rng, n=512)
    _, lo, hi = jax.jit(tp.build_cluster_data)(scene)
    visits, counts, entry = jax.jit(
        lambda: tp.block_visit_lists(
            origins, dirs, t_min, t_max, lo, hi, tp.BLOCK_RAYS
        )
    )()
    visits = np.asarray(visits)
    counts = np.asarray(counts)
    entry = np.asarray(entry)
    nc = lo.shape[1]
    for b in range(visits.shape[0]):
        c = counts[b]
        assert np.all(visits[b, c:] == nc)
        assert np.all(np.diff(entry[b, :c]) >= 0.0)  # sorted ascending
        assert len(set(visits[b, :c])) == c  # unique cluster ids


@pytest.mark.parametrize("mode", ["dir", "origin"])
def test_regroup_parity(mode):
    """Regrouped (coherence-sorted) tracing is bit-identical to the
    unsorted packet tracer: the permutation only changes which rays
    share a block, and every sub-block decision is per-ray
    (tracer_pallas._regroup_order)."""
    rng = np.random.default_rng(11)
    scene = _random_scene(rng)
    origins, dirs, t_min, t_max = _random_rays(rng, n=700)
    # Dead rays (empty interval) must sort last and still come back
    # in place.
    t_max = jnp.asarray(
        np.where(rng.uniform(size=700) < 0.3, -1.0, np.asarray(t_max))
    )
    base = tp.make_opaque_fn(interpret=True)
    reg = tp.make_opaque_fn(interpret=True, regroup=mode)
    t0, tri0, uv0, b0 = jax.jit(
        lambda: base(origins, dirs, t_min, t_max, scene)
    )()
    t1, tri1, uv1, b1 = jax.jit(
        lambda: reg(origins, dirs, t_min, t_max, scene)
    )()
    np.testing.assert_array_equal(np.asarray(tri0), np.asarray(tri1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(uv0), np.asarray(uv1))
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))

    sbase = tp.make_shadow_opaque_fn(interpret=True)
    sreg = tp.make_shadow_opaque_fn(interpret=True, regroup=mode)
    _, trib0, _, _ = jax.jit(
        lambda: sbase(origins, dirs, t_min, t_max, scene)
    )()
    _, trib1, _, _ = jax.jit(
        lambda: sreg(origins, dirs, t_min, t_max, scene)
    )()
    np.testing.assert_array_equal(np.asarray(trib0), np.asarray(trib1))
