"""Multi-chip row tiling: the FULL pipeline (DI + GI + reflections +
refraction + compacted alpha), sharded over 8 devices, must match a
single-device render of identical inputs with zero capacity drops on
either path (with drops the two paths truncate different candidates
and parity is meaningless — see __graft_entry__._dryrun_impl)."""

import numpy as np
import jax
import pytest


@pytest.fixture(scope="module")
def sharded_setup():
    from dataclasses import replace

    from rt64tpu.pipeline import framegraph as fg
    from rt64tpu.utils.testscenes import build_sample_scene

    dev, scene, view = build_sample_scene(
        width=64, height=32, gi_samples=1, with_glass=True
    )
    view.max_reflections = 2
    view.update()
    r = view._renderer
    cfg = replace(r._config(), alpha_shade_boost=16)
    assert cfg.refraction_enabled and cfg.k_primary >= 4, cfg
    gp = r._global_params(cfg)
    hist = fg.History.zeros(cfg.rt_height, cfg.rt_width)
    bg = r._background_planes(cfg)
    return r, cfg, gp, hist, bg


def test_sharded_matches_single(sharded_setup):
    from functools import partial
    from rt64tpu.parallel import tiling
    from rt64tpu.pipeline import framegraph as fg

    r, cfg, gp, hist, bg = sharded_setup
    single = jax.jit(partial(fg.render_frame, cfg=cfg))(
        r._sb, gp, hist, r.bn_table, bg
    )
    n_dev = 8
    mesh = tiling.make_mesh(jax.devices()[:n_dev])
    fn = tiling.sharded_render(mesh, cfg)
    multi = fn(r._sb, gp, fg.History.zeros(cfg.rt_height, cfg.rt_width),
               r.bn_table, bg)
    assert int(np.asarray(single.alpha_dropped)) == 0
    assert int(np.asarray(multi.alpha_dropped)) == 0
    a = np.asarray(single.image)
    b = np.asarray(multi.image)
    # Different shard shapes can change XLA's fma/reassociation choices
    # only at reduction tie-breaks; the frame is elementwise per pixel,
    # so demand near-bitwise equality.
    assert np.mean(np.abs(a - b)) < 1e-6
    assert np.max(np.abs(a - b)) < 1e-4
    np.testing.assert_array_equal(
        np.asarray(single.gbuffers.instance),
        np.asarray(multi.gbuffers.instance),
    )


def test_pallas_tracer_sharded_interpret(sharded_setup):
    """The PRODUCTION traversal path (Pallas packet kernels, interpret
    mode on CPU) executes under shard_map and matches its own
    single-device render — closing the round-3 blind spot where the
    packet tracer had never run sharded (all prior multichip validation
    used the XLA fallback)."""
    from dataclasses import replace
    from functools import partial
    from rt64tpu.parallel import tiling
    from rt64tpu.pipeline import framegraph as fg

    r, cfg, gp, hist, bg = sharded_setup
    pcfg = replace(cfg, use_pallas_tracer=True, pallas_interpret=True)
    single = jax.jit(partial(fg.render_frame, cfg=pcfg))(
        r._sb, gp, hist, r.bn_table, bg
    )
    mesh = tiling.make_mesh(jax.devices()[:8])
    # check_vma off: the Pallas INTERPRETER's internal block
    # dynamic_slice has empty-vma indices that the checker rejects;
    # the compiled kernels keep it on (tiling.sharded_render default).
    fn = tiling.sharded_render(mesh, pcfg, check_vma=False)
    multi = fn(r._sb, gp, fg.History.zeros(pcfg.rt_height, pcfg.rt_width),
               r.bn_table, bg)
    assert int(np.asarray(single.alpha_dropped)) == 0
    assert int(np.asarray(multi.alpha_dropped)) == 0
    a = np.asarray(single.image)
    b = np.asarray(multi.image)
    assert np.mean(np.abs(a - b)) < 1e-6
    assert np.max(np.abs(a - b)) < 1e-4
    np.testing.assert_array_equal(
        np.asarray(single.gbuffers.instance),
        np.asarray(multi.gbuffers.instance),
    )


def test_castle_sharded_matches_single():
    """The castle workload (streamed instance packing, 3 lights,
    alpha-tested foliage — a different buffer population than the
    sample scene) renders row-sharded with parity to single-device."""
    from dataclasses import replace
    from functools import partial
    from rt64tpu.parallel import tiling
    from rt64tpu.pipeline import framegraph as fg
    from rt64tpu.utils.castle_scene import build_castle_scene

    dev, scene, view = build_castle_scene(
        width=128, height=64, gi_samples=0, foliage=12
    )
    view.update()
    r = view._renderer
    cfg = replace(r._config(), alpha_shade_boost=16)
    gp = r._global_params(cfg)
    hist = fg.History.zeros(cfg.rt_height, cfg.rt_width)
    bg = r._background_planes(cfg)
    single = jax.jit(partial(fg.render_frame, cfg=cfg))(
        r._sb, gp, hist, r.bn_table, bg
    )
    mesh = tiling.make_mesh(jax.devices()[:8])
    fn = tiling.sharded_render(mesh, cfg)
    multi = fn(r._sb, gp, fg.History.zeros(cfg.rt_height, cfg.rt_width),
               r.bn_table, bg)
    assert int(np.asarray(single.alpha_dropped)) == 0
    assert int(np.asarray(multi.alpha_dropped)) == 0
    a = np.asarray(single.image)
    b = np.asarray(multi.image)
    assert np.mean(np.abs(a - b)) < 1e-6
    assert np.max(np.abs(a - b)) < 1e-4
