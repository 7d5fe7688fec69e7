"""Wavefront tracer vs NumPy brute-force Moller-Trumbore."""

import numpy as np
import jax.numpy as jnp

from rt64tpu.ops import tracer


def _np_intersect(orig, dirs, v0, v1, v2, cull=True, no_cull=None):
    """Brute force: returns t, u, v, hit for all (ray, tri) pairs."""
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = np.cross(dirs[:, None, :], e2[None, :, :])
    det = np.einsum("tj,rtj->rt", e1, pvec)
    if cull:
        keep = det > 1e-9
        if no_cull is not None:
            keep = np.where(no_cull[None, :], np.abs(det) > 1e-9, keep)
    else:
        keep = np.abs(det) > 1e-9
    inv = np.where(keep, 1.0 / np.where(keep, det, 1.0), 0.0)
    tvec = orig[:, None, :] - v0[None, :, :]
    u = np.einsum("rtj,rtj->rt", tvec, pvec) * inv
    qvec = np.cross(tvec, e1[None, :, :])
    v = np.einsum("rj,rtj->rt", dirs, qvec) * inv
    t = np.einsum("tj,rtj->rt", e2, qvec) * inv
    hit = keep & (u >= 0) & (v >= 0) & (u + v <= 1)
    return t, u, v, hit


def _random_scene(rng, n_tris=64, alpha_frac=0.5):
    centers = rng.uniform(-2, 2, (n_tris, 3)).astype(np.float32)
    d1 = rng.normal(0, 0.5, (n_tris, 3)).astype(np.float32)
    d2 = rng.normal(0, 0.5, (n_tris, 3)).astype(np.float32)
    v0 = centers
    v1 = centers + d1
    v2 = centers + d2
    valid = np.ones(n_tris, bool)
    alpha = rng.random(n_tris) < alpha_frac
    no_cull = np.zeros(n_tris, bool)
    bias = np.zeros(n_tris, np.float32)
    return tracer.make_trace_scene_arrays(
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
        jnp.asarray(valid), jnp.asarray(alpha),
        jnp.asarray(no_cull), jnp.asarray(bias), n_tris,
    ), (v0, v1, v2, alpha)


def test_opaque_closest_hit_matches_bruteforce():
    rng = np.random.default_rng(1)
    scene, (v0, v1, v2, alpha) = _random_scene(rng, 128, alpha_frac=0.0)
    n = 64
    orig = rng.uniform(-4, -3, (n, 3)).astype(np.float32)
    dirs = rng.normal(0, 1, (n, 3)).astype(np.float32)
    t_min = np.full(n, 0.01, np.float32)
    t_max = np.full(n, 100.0, np.float32)
    hits = tracer.trace(
        jnp.asarray(orig.T), jnp.asarray(dirs.T), jnp.asarray(t_min),
        jnp.asarray(t_max), scene, k_alpha=4, chunk=32,
    )
    t, u, v, hit = _np_intersect(orig, dirs, v0, v1, v2, cull=True)
    hit &= (t >= t_min[:, None]) & (t <= t_max[:, None])
    t_masked = np.where(hit, t, np.inf)
    best = t_masked.min(axis=1)
    got_t = np.asarray(hits.t_op)
    got_tri = np.asarray(hits.tri_op)
    for i in range(n):
        if np.isinf(best[i]):
            assert got_tri[i] == -1
        else:
            assert got_tri[i] >= 0, i
            np.testing.assert_allclose(got_t[i], best[i], rtol=1e-4)


def test_alpha_hits_sorted_and_complete():
    rng = np.random.default_rng(2)
    scene, (v0, v1, v2, alpha) = _random_scene(rng, 128, alpha_frac=1.0)
    n = 32
    orig = rng.uniform(-4, -3, (n, 3)).astype(np.float32)
    dirs = rng.normal(0, 1, (n, 3)).astype(np.float32)
    t_min = np.full(n, 0.01, np.float32)
    t_max = np.full(n, 100.0, np.float32)
    k = 6
    hits = tracer.trace(
        jnp.asarray(orig.T), jnp.asarray(dirs.T), jnp.asarray(t_min),
        jnp.asarray(t_max), scene, k_alpha=k, chunk=32,
    )
    t, u, v, hit = _np_intersect(orig, dirs, v0, v1, v2, cull=True)
    hit &= (t >= t_min[:, None]) & (t <= t_max[:, None])
    got_t = np.asarray(hits.t_a)
    got_tri = np.asarray(hits.tri_a)
    for i in range(n):
        want = np.sort(t[i][hit[i]])[:k]
        got = got_t[i][got_tri[i] >= 0]
        assert np.all(np.diff(got) >= -1e-5), "alpha hits must be sorted"
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_depth_bias_reorders_coplanar():
    # Two coplanar triangles; the biased one sorts in front.
    v0 = np.array([[-1, -1, 5], [-1, -1, 5]], np.float32)
    v1 = np.array([[3, -1, 5], [3, -1, 5]], np.float32)
    v2 = np.array([[-1, 3, 5], [-1, 3, 5]], np.float32)
    scene = tracer.make_trace_scene_arrays(
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
        jnp.asarray([True, True]), jnp.asarray([True, True]),
        jnp.asarray([True, True]),
        jnp.asarray([0.0, 1.0], dtype=jnp.float32), 2,
    )
    orig = jnp.asarray([[0.0], [0.0], [0.0]])
    dirs = jnp.asarray([[0.0], [0.0], [1.0]])
    hits = tracer.trace(
        orig, dirs, jnp.asarray([0.01]), jnp.asarray([100.0]), scene,
        k_alpha=2, chunk=2,
    )
    # Triangle 1 has bias 1.0 -> sort key 4.0 < 5.0 -> first slot.
    assert int(hits.tri_a[0, 0]) == 1
    assert int(hits.tri_a[0, 1]) == 0
    # Reported t is unbiased (WithoutDistanceBias).
    np.testing.assert_allclose(np.asarray(hits.t_a[0]), [5.0, 5.0], rtol=1e-5)


def test_backface_culling_flag():
    # Geometric normal cross(e1,e2) = +z = pointing along the ray,
    # i.e. the ray sees the back face -> culled.
    v0 = np.array([[-1, -1, 5]], np.float32)
    v1 = np.array([[3, -1, 5]], np.float32)
    v2 = np.array([[-1, 3, 5]], np.float32)
    mk = lambda nc: tracer.make_trace_scene_arrays(
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
        jnp.asarray([True]), jnp.asarray([False]),
        jnp.asarray([nc]), jnp.asarray([0.0], dtype=jnp.float32), 1,
    )
    orig = jnp.asarray([[0.0], [0.0], [0.0]])
    dirs = jnp.asarray([[0.0], [0.0], [1.0]])
    tmin = jnp.asarray([0.01])
    tmax = jnp.asarray([100.0])
    culled = tracer.trace(orig, dirs, tmin, tmax, mk(False), k_alpha=1, chunk=1)
    kept = tracer.trace(orig, dirs, tmin, tmax, mk(True), k_alpha=1, chunk=1)
    assert int(culled.tri_op[0]) == -1
    assert int(kept.tri_op[0]) == 0
    # Shadow rays don't cull (SKIP_BACKFACE_SHADOWS undefined).
    sh = tracer.trace_shadow(orig, dirs, tmin, tmax, mk(False), k_alpha=1)
    assert int(sh.tri_op[0]) == 0


def test_alpha_capacity_growth_no_silent_truncation():
    """>256 alpha triangles must all be reachable: the packer grows the
    compacted-list capacity instead of silently dropping hits
    (any-hit completeness, rt64_shader.cpp:547-581)."""
    from rt64tpu.limits import SceneLimits
    from rt64tpu.pipeline.scene_buffers import ScenePacker

    n_alpha = 320
    # 320 parallel alpha quora along +z; a ray down z must see the LAST
    # one (index > 256) among its K nearest when traced front-to-back.
    v0 = np.zeros((n_alpha, 3), np.float32)
    v1 = np.zeros((n_alpha, 3), np.float32)
    v2 = np.zeros((n_alpha, 3), np.float32)
    z = 1.0 + np.arange(n_alpha, dtype=np.float32)
    v0[:, 0], v0[:, 1], v0[:, 2] = -1, -1, z
    v1[:, 0], v1[:, 1], v1[:, 2] = 3, -1, z
    v2[:, 0], v2[:, 1], v2[:, 2] = -1, 3, z
    valid = np.ones(n_alpha, bool)
    alpha = np.ones(n_alpha, bool)
    no_cull = np.ones(n_alpha, bool)
    bias = np.zeros(n_alpha, np.float32)

    # Old behavior: capacity 256 silently drops ids >= 256.
    truncated = tracer.compact_alpha(
        jnp.asarray(valid), jnp.asarray(alpha), 256
    )
    assert int((np.asarray(truncated) >= 0).sum()) == 256

    # Grown capacity (what ScenePacker.alpha_cap now returns) keeps all.
    packer = ScenePacker(SceneLimits())
    packer.alpha_triangle_count = n_alpha
    cap = packer.alpha_cap
    assert cap >= n_alpha
    scene = tracer.make_trace_scene_arrays(
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
        jnp.asarray(valid), jnp.asarray(alpha),
        jnp.asarray(no_cull), jnp.asarray(bias), cap,
    )
    assert int((np.asarray(scene.alpha_idx) >= 0).sum()) == n_alpha

    # A ray starting just before quad 300 must collect quads 300..303:
    # all beyond the old 256 cap.
    orig = jnp.asarray(np.array([[0.0, 0.0, 300.5]], np.float32).T)
    dirs = jnp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32).T)
    hits = tracer.trace(
        orig, dirs, jnp.asarray(np.array([0.01], np.float32)),
        jnp.asarray(np.array([1000.0], np.float32)), scene,
        k_alpha=4, cull_backface=False, chunk=64,
    )
    got = sorted(int(i) for i in np.asarray(hits.tri_a[0]) if i >= 0)
    assert got == [300, 301, 302, 303], got
