"""Upscaler slot tests: policy tables, temporal accumulation, learned CNN."""

import numpy as np
import jax.numpy as jnp

from rt64tpu import descriptors as d
from rt64tpu.models import upscaler as ups


def test_quality_auto_thresholds():
    # getQualityAuto thresholds (rt64_upscaler.cpp:11-36).
    assert ups.quality_auto(1280, 720) == d.UPSCALER_MODE_ULTRA_QUALITY
    assert ups.quality_auto(1920, 1080) == d.UPSCALER_MODE_QUALITY
    assert ups.quality_auto(2560, 1440) == d.UPSCALER_MODE_BALANCED
    assert ups.quality_auto(3840, 2160) == d.UPSCALER_MODE_PERFORMANCE
    assert ups.quality_auto(7680, 4320) == d.UPSCALER_MODE_ULTRA_PERFORMANCE


def test_quality_resolution_fsr_ultra_quality():
    # FSR forces UltraQuality to 77% (rt64_fsr.cpp:104-112); the TPU
    # build snaps to the frame graph's tile grid (w%64, h%8 — see
    # quality_resolution docstring), so 770x385 -> 768x384.
    w, h = ups.quality_resolution(d.UPSCALER_MODE_ULTRA_QUALITY, 1000, 500)
    assert (w, h) == (768, 384)
    assert w % 64 == 0 and h % 8 == 0
    w, h = ups.quality_resolution(d.UPSCALER_MODE_NATIVE, 1000, 500)
    assert (w, h) == (1000, 500)


def test_jitter_phase_count():
    # ffxFsr2GetJitterPhaseCount = ceil(8 * ratio^2).
    assert ups.jitter_phase_count(960, 1920) == 32
    assert ups.jitter_phase_count(1920, 1920) == 8


def test_temporal_accumulate_converges():
    h, w, dh, dw = 8, 8, 16, 16
    rng = np.random.default_rng(0)
    rt = jnp.asarray(rng.random((3, h, w)).astype(np.float32))
    flow = jnp.zeros((2, h, w))
    reactive = jnp.zeros((h, w))
    lock = jnp.zeros((h, w))
    hist = jnp.zeros((3, dh, dw))
    out = ups.temporal_accumulate(hist, rt, flow, reactive, lock,
                                  jnp.bool_(True), dh, dw)
    # Reset frame: output == bilinear upscale.
    from rt64tpu.ops import filters
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(filters.bilinear_resize(rt, dh, dw)),
        atol=1e-6,
    )
    # Static scene: repeated accumulation stays stable (no drift).
    prev = out
    for _ in range(8):
        prev = ups.temporal_accumulate(prev, rt, flow, reactive, lock,
                                       jnp.bool_(False), dh, dw)
    np.testing.assert_allclose(np.asarray(prev), np.asarray(out), atol=1e-3)


def test_infrm_temporal_upscaler_fused_path():
    """The production internal-res path (rt64_view.cpp:114-141,
    1584-1618): with the FSR slot on, render_frame renders at the
    quality-table internal resolution and upscales IN-JIT — the
    temporal history rides the frame outputs (FrameOutputs.temporal),
    no host round-trip between render and upscale."""
    from rt64tpu.utils.testscenes import build_sample_scene

    dev, scene, view = build_sample_scene(
        width=128, height=96, gi_samples=0, upscaler=d.UPSCALER_FSR,
    )
    view.desc.upscaler_mode = d.UPSCALER_MODE_PERFORMANCE  # 50% internal
    dev.draw()
    r = view._renderer
    cfg = r._config()
    assert (cfg.rt_width, cfg.rt_height) == (64, 48)
    assert (cfg.display_width, cfg.display_height) == (128, 96)
    # Display-res output, in-frame history produced.
    assert r._last.image.shape == (3, 96, 128)
    assert r._last.temporal is not None
    assert r._last.temporal.shape == (3, 96, 128)
    fb = view.framebuffer()
    assert fb.shape == (96, 128, 4)
    assert fb[..., :3].std() > 5
    # Frame 0 (reset) == bilinear upscale of the internal render.
    from rt64tpu.ops import filters

    want = np.asarray(filters.bilinear_resize(r._last.rt_output, 96, 128))
    np.testing.assert_allclose(np.asarray(r._last.image), want, atol=1e-5)
    # Subsequent frames accumulate on-device (history identity flows).
    first = np.asarray(r._last.image)
    for _ in range(3):
        dev.draw()
    later = np.asarray(r._last.image)
    # Static scene, jittered rays: stays close but not byte-identical.
    assert np.abs(later - first).mean() < 0.1


def test_infrm_learned_upscaler_fused_path():
    """DLSS/XeSS slot fused in-jit: display-res output straight from
    render_frame, no temporal state."""
    from rt64tpu.utils.testscenes import build_sample_scene

    dev, scene, view = build_sample_scene(
        width=128, height=96, gi_samples=0, upscaler=d.UPSCALER_DLSS,
    )
    view.desc.upscaler_mode = d.UPSCALER_MODE_PERFORMANCE
    dev.draw()
    r = view._renderer
    assert r._last.image.shape == (3, 96, 128)
    assert r._last.temporal is None
    assert view.framebuffer()[..., :3].std() > 5


def test_upscaler_sharpness_consumed():
    """upscalerSharpness (rt64_upscaler.h:25-41) measurably changes the
    shipped frame: the reference feeds it to FSR2's RCAS
    (rt64_fsr.cpp:141-166) / DLSS (rt64_dlss.cpp:205); here it drives an
    RCAS tap on the upscaled output. Off at 0.0 (bitwise identity) and
    it sharpens, not just perturbs: edge energy goes UP."""
    from rt64tpu.utils.testscenes import build_sample_scene

    frames = {}
    for sharp in (0.0, 0.8):
        dev, scene, view = build_sample_scene(
            width=128, height=96, gi_samples=0, upscaler=d.UPSCALER_FSR,
        )
        view.desc.upscaler_mode = d.UPSCALER_MODE_PERFORMANCE
        view.desc.upscaler_sharpness = sharp
        dev.draw()
        frames[sharp] = np.asarray(
            view._renderer._last.image, dtype=np.float64
        )
        # The knob is traced, not shape-changing: flipping it at
        # runtime must not grow the jit cache beyond the static gate.
        if sharp > 0.0:
            view.desc.upscaler_sharpness = 0.4
            dev.draw()
            frames["mid"] = np.asarray(
                view._renderer._last.image, dtype=np.float64
            )
    # Compare in DISPLAY space: the sharpened path clips to [0, 1]
    # first (the present pack applies the same clip to both).
    a0 = np.clip(frames[0.0], 0.0, 1.0)
    a8 = frames[0.8]
    assert np.abs(a8 - a0).max() > 1e-3  # knob is live

    def edge_energy(img):
        gx = img[:, :, 1:] - img[:, :, :-1]
        gy = img[:, 1:, :] - img[:, :-1, :]
        return float(np.abs(gx).mean() + np.abs(gy).mean())

    assert edge_energy(a8) > edge_energy(a0)
    # RCAS never rings: output stays in display range.
    assert a8.max() <= 1.0 + 1e-5
    assert a8.min() >= -1e-5


def test_rcas_identity_and_sharpening():
    """filters.rcas unit contract: exact identity at sharpness 0,
    monotone edge enhancement, and no overshoot past the local
    neighborhood range."""
    from rt64tpu.ops import filters
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    img = jnp.asarray(
        np.clip(rng.random((3, 16, 24)) * 0.5
                + (np.arange(24) > 12)[None, None, :] * 0.4, 0, 1),
        jnp.float32,
    )
    out0 = np.asarray(filters.rcas(img, jnp.float32(0.0)))
    np.testing.assert_array_equal(out0, np.asarray(img))
    out1 = np.asarray(filters.rcas(img, jnp.float32(1.0)))
    assert np.abs(out1 - np.asarray(img)).max() > 1e-4
    assert np.isfinite(out1).all()


def test_xess_tables_and_phases():
    # XeSS publishes its own quality ladder (rt64_xess.cpp:94-124):
    # UltraQuality is a 1.3x ratio, not FSR's forced 77%.
    wf, _ = ups.quality_resolution(d.UPSCALER_MODE_ULTRA_QUALITY, 1000, 500)
    wx, _ = ups.quality_resolution(d.UPSCALER_MODE_ULTRA_QUALITY, 1000, 500,
                                   upscaler=d.UPSCALER_XESS)
    assert wf == 768 and wx == 768  # same after tile snap at this size
    wx, hx = ups.quality_resolution(d.UPSCALER_MODE_ULTRA_QUALITY, 2000, 1000,
                                    upscaler=d.UPSCALER_XESS)
    assert (wx, hx) == (1536, 768)  # 2000/1.3=1538 -> snap 1536
    # DLSS and XeSS report 64 jitter phases (rt64_dlss.cpp:189-191,
    # rt64_xess.cpp:126-130); FSR keeps the ffx formula.
    assert ups.jitter_phase_count(960, 1920, d.UPSCALER_XESS) == 64
    assert ups.jitter_phase_count(960, 1920, d.UPSCALER_DLSS) == 64
    assert ups.jitter_phase_count(960, 1920, d.UPSCALER_FSR) == 32


def test_xess_accumulate_reset_static_and_disocclusion():
    from rt64tpu.ops import filters

    h, w, dh, dw = 8, 8, 16, 16
    rng = np.random.default_rng(1)
    rt = jnp.asarray(rng.random((3, h, w)).astype(np.float32))
    depth = jnp.full((h, w), 0.5)
    flow = jnp.zeros((2, h, w))
    resp = jnp.zeros((h, w))
    hist = jnp.zeros((4, dh, dw))
    out, new_hist = ups.xess_accumulate(hist, rt, depth, flow, resp,
                                        jnp.bool_(True), dh, dw)
    # Reset frame == (clamped) Catmull-Rom upsample; history carries
    # the output plus the display-res depth.
    want = np.maximum(
        np.asarray(filters.bilinear_resize(rt, dh, dw, kernel="catmull")),
        0.0,
    )
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)
    assert new_hist.shape == (4, dh, dw)
    np.testing.assert_allclose(np.asarray(new_hist[3]), 0.5, atol=1e-5)
    # Static scene: stable fixed point (no drift).
    prev, ph = out, new_hist
    for _ in range(8):
        prev, ph = ups.xess_accumulate(ph, rt, depth, flow, resp,
                                       jnp.bool_(False), dh, dw)
    np.testing.assert_allclose(np.asarray(prev), np.asarray(out), atol=1e-3)
    # Depth disocclusion: history whose depth disagrees is rejected —
    # the output snaps to the current frame there.
    bad_hist = ph.at[3].set(0.9).at[:3].set(0.0)  # stale black history
    out2, _ = ups.xess_accumulate(bad_hist, rt, depth, flow, resp,
                                  jnp.bool_(False), dh, dw)
    np.testing.assert_allclose(np.asarray(out2), want, atol=1e-6)


def test_infrm_xess_fused_path_distinct_from_fsr():
    """The XeSS slot is a real THIRD backend: depth-validated temporal
    reprojection + Catmull-Rom spatial kernel, fused in-jit with a
    4-channel donated history — and its output differs from both the
    FSR slot and the learned slot on the same scene."""
    from rt64tpu.utils.testscenes import build_sample_scene

    frames = {}
    for name, upscaler in (("xess", d.UPSCALER_XESS),
                           ("fsr", d.UPSCALER_FSR)):
        dev, scene, view = build_sample_scene(
            width=128, height=96, gi_samples=0, upscaler=upscaler,
        )
        view.desc.upscaler_mode = d.UPSCALER_MODE_PERFORMANCE
        for _ in range(2):
            dev.draw()
        r = view._renderer
        assert r._last.image.shape == (3, 96, 128)
        frames[name] = np.asarray(view.framebuffer()[..., :3], np.float32)
        if name == "xess":
            assert r._last.temporal is not None
            assert r._last.temporal.shape == (4, 96, 128)
    assert frames["xess"].std() > 5
    assert np.abs(frames["xess"] - frames["fsr"]).mean() > 0.05


def test_learned_params_first_touch_inside_trace():
    """get_params() is first called DURING render_frame tracing on the
    fused DLSS path (framegraph.py:1436). The module-level cache must
    hold concrete arrays, not the first trace's tracers — a leaked
    cache makes every LATER trace die with UnexpectedTracerError (this
    is exactly how benchmarks/upscaler_eval.py first failed)."""
    import jax
    import jax.numpy as jnp2
    from rt64tpu.models import learned_upscaler as lu

    saved = lu._params
    lu._params = None
    try:
        @jax.jit
        def first(x):
            return x + jax.tree_util.tree_leaves(lu.get_params())[0].sum()

        first(jnp2.zeros(()))

        @jax.jit
        def second(x):
            return x * jax.tree_util.tree_leaves(lu.get_params())[0].sum()

        second(jnp2.ones(()))  # dies here if the cache leaked tracers
        assert not any(
            isinstance(leaf, jax.core.Tracer)
            for leaf in jax.tree_util.tree_leaves(lu._params)
        )
    finally:
        lu._params = saved


def test_learned_upscaler_residual_start():
    """A freshly initialized CNN starts at (near) identity over
    bilinear (zero-init final conv); shipped trained params may
    deviate, so pin the init explicitly."""
    import jax
    import jax.numpy as jnp2
    from rt64tpu.models import learned_upscaler
    from rt64tpu.ops import filters

    learned_upscaler._params = learned_upscaler._model.init(
        jax.random.PRNGKey(0), jnp2.zeros((8, 8, 7))
    )

    class FakeG:
        pass

    class FakeOut:
        pass

    h, w = 8, 8
    rng = np.random.default_rng(1)
    out = FakeOut()
    out.rt_output = jnp.asarray(rng.random((3, h, w)).astype(np.float32))
    g = FakeG()
    g.depth = jnp.zeros((h * w,))
    g.flow = jnp.zeros((2, h * w))
    g.reactive = jnp.zeros((h * w,))
    out.gbuffers = g

    from rt64tpu.pipeline.framegraph import RenderConfig

    Cfg = RenderConfig(rt_width=w, rt_height=h, display_width=16,
                       display_height=16)

    try:
        res = learned_upscaler.upscale(out, Cfg)
        want = filters.bilinear_resize(out.rt_output, 16, 16)
        np.testing.assert_allclose(np.asarray(res), np.asarray(want), atol=1e-5)
    finally:
        learned_upscaler._params = None  # restore shipped params
