"""shade_hits_compacted must match shade_hits on all compacted lanes.

The compacted shade is branch-free: hits beyond `capacity` are dropped
and counted (the caller grows capacity and re-specializes — see
shade_hits_compacted's docstring)."""

import numpy as np
import jax.numpy as jnp

from rt64tpu.ops import shading as shade_ops
from rt64tpu.utils.testscenes import build_sample_scene


def _inputs(n_hit_fraction):
    dev, scene, view = build_sample_scene(width=64, height=48, gi_samples=0)
    view.update()
    r = view._renderer
    sb = r._sb
    tri_rows, rows_t = shade_ops.build_tri_rows(sb)
    t = r.packer.triangle_count
    n = 64 * 48
    rng = np.random.default_rng(7)
    tri = np.full((n,), -1, np.int32)
    hit = rng.random(n) < n_hit_fraction
    tri[hit] = rng.integers(0, t, hit.sum())
    u = rng.random(n).astype(np.float32) * 0.5
    v = rng.random(n).astype(np.float32) * 0.5
    dirs = rng.normal(size=(3, n)).astype(np.float32)
    noise = rng.random(n).astype(np.float32)
    return sb, tri_rows, jnp.asarray(dirs), jnp.asarray(tri), \
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(noise)


def _edge_on_mask(tri_rows, tri, dirs):
    """Lanes where the face-orientation test (dot(tri_nrm, dir) <= 0)
    is FMA-order sensitive (edge-on rays): excluded from the normal
    comparison — both signs are geometrically valid there."""
    from rt64tpu.pipeline import rows as R

    gt = np.asarray(tri_rows)[np.maximum(np.asarray(tri), 0)].T
    e1 = gt[R.T_P1:R.T_P1 + 3] - gt[R.T_P0:R.T_P0 + 3]
    e2 = gt[R.T_P2:R.T_P2 + 3] - gt[R.T_P0:R.T_P0 + 3]
    tn = np.cross(e1.T, e2.T).T
    dn = np.abs((tn * np.asarray(dirs)).sum(0))
    scale = np.linalg.norm(tn, axis=0) * np.linalg.norm(
        np.asarray(dirs), axis=0)
    return dn <= 1e-5 * np.maximum(scale, 1e-12)


def _compare(ref, got, tri, tri_rows, dirs, lanes):
    edge_on = _edge_on_mask(tri_rows, tri, dirs)
    hit = np.asarray(tri) >= 0
    for f in shade_ops.HitShade._fields:
        a, b = np.asarray(getattr(ref, f)), np.asarray(getattr(got, f))
        keep = lanes.copy()
        if f == "normal":
            keep &= ~edge_on
        if f == "rows_t":
            # Miss lanes: the full shade leaves row-0's (unconsumed)
            # gather there, the compacted path zeroes them — every
            # consumer masks by validity, so only hit lanes must match.
            keep &= hit
        a, b = a[..., keep], b[..., keep]
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5,
                                       err_msg=f)
        else:
            np.testing.assert_array_equal(a, b, err_msg=f)


def test_compacted_matches_full():
    sb, tri_rows, dirs, tri, u, v, noise = _inputs(0.02)
    ref = shade_ops.shade_hits(sb, tri_rows, dirs, tri, u, v, noise)
    ref = ref._replace(tri=tri)
    got, dropped = shade_ops.shade_hits_compacted(
        sb, tri_rows, dirs, tri, u, v, noise, 512
    )
    assert int(dropped) == 0
    _compare(ref, got, tri, tri_rows, dirs, np.ones(tri.shape[0], bool))


def test_compacted_overflow_drops_and_counts():
    sb, tri_rows, dirs, tri, u, v, noise = _inputs(0.5)
    n_hits = int(np.asarray((tri >= 0).sum()))
    cap = n_hits // 2
    got, dropped = shade_ops.shade_hits_compacted(
        sb, tri_rows, dirs, tri, u, v, noise, cap
    )
    assert int(dropped) == n_hits - cap
    # Exactly `cap` lanes carry shaded hits; the rest are empty slots.
    shaded = np.asarray(got.tri) >= 0
    assert shaded.sum() == cap
    # Shaded lanes match the full shade.
    ref = shade_ops.shade_hits(sb, tri_rows, dirs, tri, u, v, noise)
    ref = ref._replace(tri=tri)
    _compare(ref, got, tri, tri_rows, dirs, shaded)


def test_compacted_exact_capacity_boundary():
    sb, tri_rows, dirs, tri, u, v, noise = _inputs(0.1)
    n_hits = int(np.asarray((tri >= 0).sum()))
    got, dropped = shade_ops.shade_hits_compacted(
        sb, tri_rows, dirs, tri, u, v, noise, n_hits
    )
    assert int(dropped) == 0
    ref = shade_ops.shade_hits(sb, tri_rows, dirs, tri, u, v, noise)
    np.testing.assert_allclose(
        np.asarray(ref.color), np.asarray(got.color), rtol=1e-4, atol=1e-5
    )
