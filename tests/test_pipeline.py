"""End-to-end frame tests on the CPU backend (the WARP-config analog,
SURVEY.md section 4)."""

import numpy as np
import pytest

from rt64tpu.utils.testscenes import build_sample_scene


@pytest.fixture(scope="module")
def sample():
    dev, scene, view = build_sample_scene(width=96, height=72)
    dev.draw()
    return dev, scene, view


def test_frame_renders_nonblack(sample):
    dev, scene, view = sample
    fb = view.framebuffer()
    assert fb.shape == (72, 96, 4)
    assert fb[..., :3].mean() > 10  # not black
    assert fb[..., :3].std() > 5  # not constant


def test_sphere_visible_and_pickable(sample):
    dev, scene, view = sample
    # Center of the view should hit the sphere (instance 0).
    inst = view.get_raytraced_instance_at(48, 30)
    assert inst is scene.instances[0]
    # Sky region (top corner) hits nothing.
    assert view.get_raytraced_instance_at(2, 2) is None


def test_shadow_darker_than_lit(sample):
    dev, scene, view = sample
    out = view._renderer._last
    h, w = 72, 96
    direct = np.asarray(out.direct_accum[:3].reshape(3, h, w))
    inst = np.asarray(out.gbuffers.instance.reshape(h, w))
    floor_mask = inst == 1
    # The light sits up-right; the sphere shadow falls left of center.
    lum = direct.sum(0)
    shadow_region = lum[(floor_mask) & (np.indices((h, w))[1] < w // 2)]
    lit_region = lum[(floor_mask) & (np.indices((h, w))[1] >= w * 3 // 4)]
    assert shadow_region.min() < lit_region.mean() * 0.5


def test_temporal_accumulation_progresses(sample):
    dev, scene, view = sample
    len0 = np.asarray(view._renderer._last.indirect_accum[3])
    dev.draw()
    dev.draw()
    len2 = np.asarray(view._renderer._last.indirect_accum[3])
    # History length should grow where reprojection succeeds... with the
    # denoiser off gi_reproject=False, so it stays 1 — verify that too.
    assert len2.max() <= 64.0
    assert len0.max() >= 1.0


def test_visualization_modes_render():
    from rt64tpu import descriptors as d

    # gi_samples=0 keeps the jitted frame small: this test compiles 3
    # distinct vis-mode programs on the single-core CPU backend.
    dev, scene, view = build_sample_scene(width=64, height=48, gi_samples=0)
    for mode in (d.VISUALIZATION_MODE_SHADING_NORMAL,
                 d.VISUALIZATION_MODE_DEPTH,
                 d.VISUALIZATION_MODE_INSTANCE_ID):
        view.visualization_mode = mode
        dev.draw()
        fb = view.framebuffer()
        assert fb[..., :3].std() > 0


def test_raster_hud_and_background():
    import rt64tpu
    from rt64tpu.utils.testscenes import build_sample_scene, hud_triangle

    dev, scene, view = build_sample_scene(width=64, height=48, gi_samples=0)
    hud = hud_triangle(scene, dev, color=(1.0, 0.1, 0.1, 1.0))
    bg = hud_triangle(scene, dev, color=(0.1, 0.9, 0.1, 1.0), background=True)
    dev.draw()
    fb = view.framebuffer().astype(np.float32)
    # HUD triangle occupies the top-left region: strongly red.
    hud_px = fb[5, 8]
    assert hud_px[0] > 150 and hud_px[1] < 100, hud_px
    # The sky area (no sphere/floor, top-right) shows the green raster
    # background blended through the sky alpha.
    out = view._renderer._last
    bgc = np.asarray(out.gbuffers.diffuse_rgb.reshape(3, 48, 64))[:, 2, 60]
    assert bgc[1] > bgc[0], bgc  # green dominates where rays miss


def test_checkpoint_resume(tmp_path, sample):
    from rt64tpu.utils.checkpoint import save_view_state, restore_view_state

    dev, scene, view = sample
    dev.draw()
    path = str(tmp_path / "state.npz")
    save_view_state(view, path)
    hist_before = np.asarray(view._renderer.history.indirect)
    fc_before = view.frame_count
    # Clobber state, then restore.
    view._renderer.history = None
    view.frame_count = 0
    restore_view_state(view, path)
    np.testing.assert_array_equal(
        np.asarray(view._renderer.history.indirect), hist_before
    )
    assert view.frame_count == fc_before
    dev.draw()  # resumes cleanly


def test_inspector_console_dump_and_gizmos(tmp_path):
    import rt64tpu
    from rt64tpu.utils.testscenes import build_sample_scene

    dev, scene, view = build_sample_scene(width=64, height=48)
    insp = rt64tpu.Inspector(dev)
    insp.print_message("hello")
    insp.print_message("world")
    assert insp.messages == ["hello", "world"]
    insp.print_clear()
    assert insp.messages == []
    insp.dump_path = str(tmp_path)
    insp.show_light_gizmos = True
    dev.draw()
    import os

    assert os.path.exists(str(tmp_path) + "/frame_00000.png")


def test_gizmo_occlusion_dither():
    """A light gizmo BEHIND scene geometry draws dithered at half
    opacity (Im3DPS.hlsl:9-26): only odd-parity checkerboard pixels
    change, and those move less than a full overwrite would."""
    import rt64tpu
    from rt64tpu.utils.testscenes import build_sample_scene

    dev, scene, view = build_sample_scene(width=64, height=48)
    insp = rt64tpu.Inspector(dev)
    dev.draw()
    # Find a hit pixel near screen center and push the light behind it.
    inst_plane = view._renderer.instance_plane()
    ys, xs = np.nonzero(inst_plane >= 0)
    assert len(ys) > 0
    # Eye + the hit direction, extended far past the geometry.
    eye = np.linalg.inv(view.view_matrix.astype(np.float64))[3, :3]
    light = scene.lights[0]
    center = np.asarray(
        view._renderer._last.gbuffers.position
    ).mean(axis=1)
    light.position = tuple(eye + (center - eye) * 20.0)

    insp.show_light_gizmos = True
    before = view.framebuffer()[..., :3].copy()
    insp.render()
    after = view.framebuffer()[..., :3]
    changed = np.nonzero((before != after).any(axis=-1))
    assert len(changed[0]) > 0  # gizmo drew something
    # Occluded dither: every changed pixel has odd parity.
    assert (((changed[0] + changed[1]) % 2) == 1).all()


def test_camera_control_perspective():
    """Inspector free-camera control (rt64_view.cpp:1769-1782):
    move translates along the view basis, rotate orbits in place."""
    from rt64tpu.utils.testscenes import build_sample_scene

    dev, scene, view = build_sample_scene(width=64, height=48)
    before = view.view_matrix.copy()
    pos0 = np.linalg.inv(view.view_matrix)[3, :3].copy()
    view.move_perspective((0.0, 0.0, 2.0))
    pos1 = np.linalg.inv(view.view_matrix)[3, :3]
    assert not np.allclose(before, view.view_matrix)
    assert abs(np.linalg.norm(pos1 - pos0) - 2.0) < 1e-4
    view.rotate_perspective(0.3, 0.1)
    pos2 = np.linalg.inv(view.view_matrix)[3, :3]
    np.testing.assert_allclose(pos2, pos1, atol=1e-3)  # rotation keeps pos


def test_inspector_command_edits_change_next_frame():
    """Live parameter editing (the ImGui-panel analog): a material edit
    through Inspector.command must change the next rendered frame
    (rt64_inspector.cpp:226-309 + the per-frame descriptor push)."""
    import rt64tpu
    from rt64tpu import descriptors as d

    dev, scene, view = build_sample_scene(width=64, height=48, gi_samples=0)
    sphere = scene.instances[0]
    ins = rt64tpu.Inspector(dev)
    ins.set_material(sphere.desc.material, "sphere")
    dev.draw()
    before = view.framebuffer().astype(np.float32)

    # Tint the sphere solid red via the diffuse color mix.
    assert ins.command("set material.diffuse_color_mix 1 0 0 1") == "OK"
    assert ins.command("get material.diffuse_color_mix") == "1 0 0 1"
    dev.draw()
    after = view.framebuffer().astype(np.float32)
    assert not np.allclose(before[24, 32], after[24, 32])
    # The raw combiner output (diffuse tap) shows the red tint without
    # lighting/specular washout.
    view.visualization_mode = d.VISUALIZATION_MODE_DIFFUSE
    dev.draw()
    diff = view.framebuffer().astype(np.float32)[24, 32]
    assert diff[0] > diff[1] * 2, diff  # red dominates now
    view.visualization_mode = d.VISUALIZATION_MODE_FINAL

    # View edit: switch visualization mode through the command channel.
    assert ins.command("set view.visualization_mode 16") == "OK"  # depth
    assert view.visualization_mode == d.VISUALIZATION_MODE_DEPTH
    assert ins.command("set view.di_samples 2") == "OK"
    assert view.desc.di_samples == 2
    assert ins.command("camera move 0.5 0 0") == "OK"
    assert ins.command("list view").startswith("max_reflections")


def test_inspector_gizmo_drag_moves_light_in_view_plane():
    """Interactive light gizmo (Im3d::GizmoTranslation analog,
    rt64_inspector.cpp:324 + the cursor ray from setupWithView):
    pressing on a light's projected pixel selects it, dragging
    translates it in the camera-facing plane (depth along the view
    axis preserved), and edits write through the registered refs."""
    import rt64tpu
    from rt64tpu.ops import math3d

    dev, scene, view = build_sample_scene(width=64, height=48)
    ins = rt64tpu.Inspector(dev)
    ins.set_lights(scene.lights, len(scene.lights), 16)

    li = scene.lights[0]
    # The sample scene's sun sits behind the camera; park it 10 units
    # down the view axis so its gizmo is on screen.
    eye = view.get_view_position()
    fwd = view.get_view_direction()
    li.position = tuple(float(v) for v in (eye + fwd * 10.0))
    pos0 = np.asarray(li.position, np.float32)
    proj = math3d.perspective_fov_rh(
        view.fov_radians, view.width / view.height,
        view.near_dist, view.far_dist,
    )
    clip = math3d.transform_points_h(pos0, view.view_matrix @ proj)
    assert clip[3] > 0, "sample light must be in front of the camera"
    sx = (0.5 + 0.5 * clip[0] / clip[3]) * view.width
    sy = (0.5 - 0.5 * clip[1] / clip[3]) * view.height

    assert ins.command("gizmo press 1 1") == "MISS"  # corner: no light
    assert ins.command(f"gizmo press {sx:.1f} {sy:.1f}") == "OK 0"
    rep = ins.command(f"gizmo drag {sx + 6:.1f} {sy:.1f}")
    assert rep.startswith("OK "), rep
    pos1 = np.asarray(li.position, np.float32)
    assert np.linalg.norm(pos1 - pos0) > 1e-3  # it moved...
    d0 = float(np.dot(pos0 - eye, fwd))
    d1 = float(np.dot(pos1 - eye, fwd))
    assert abs(d1 - d0) < 1e-2 * max(1.0, abs(d0))  # ...in the view plane
    assert ins.command("gizmo release") == "OK"
    assert ins.command("gizmo drag 10 10") == "MISS"


def test_alpha_capacity_boost_converges():
    """Capacity auto-grow contract (view.py render): an overflowing
    alpha scene doubles the shade boost and RE-RENDERS the frame at the
    grown capacity before presenting (round-4 VERDICT ask #9) — no
    presented frame is ever missing alpha layers, the boost converges,
    and it never oscillates."""
    import numpy as np

    from rt64tpu.utils.testscenes import build_sample_scene

    dev, scene, view = build_sample_scene(
        width=64, height=32, gi_samples=0, with_glass=True
    )
    view.max_reflections = 0

    boosts, drops = [], []
    for _ in range(8):
        dev.draw()
        r = view._renderer
        boosts.append(r._alpha_boost)
        drops.append(int(np.asarray(r._last.alpha_dropped)))

    # EVERY presented frame is drop-free: the overflow frame re-rendered
    # at the grown capacity before present (non-pipelined contract).
    assert all(dr == 0 for dr in drops), (drops, boosts)
    # Monotone, bounded, and stable after the first frame's growth.
    assert boosts == sorted(boosts), boosts
    assert boosts[-1] <= 16
    assert len(set(boosts)) <= 2, boosts  # grown during frame 0, then held


def test_interpolated_midframe():
    """Flow-based frame interpolation (BASELINE config 5's pacing
    clause): zero flow gives the plain blend; the view-level midframe
    is produced on device between consecutive draws."""
    import jax.numpy as jnp

    from rt64tpu.ops import filters

    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.random((3, 16, 24)), jnp.float32)
    b = jnp.asarray(rng.random((3, 16, 24)), jnp.float32)
    zero_flow = jnp.zeros((2, 16, 24), jnp.float32)
    mid = np.asarray(filters.interpolate_frame(a, b, zero_flow, 0.5))
    np.testing.assert_allclose(
        mid, np.asarray(0.5 * a + 0.5 * b), atol=1e-5
    )
    # t=0/1 with zero flow recover the endpoint frames exactly.
    np.testing.assert_allclose(
        np.asarray(filters.interpolate_frame(a, b, zero_flow, 0.0)),
        np.asarray(a), atol=1e-5,
    )
    # A uniform flow shifts content: a vertical edge in `b` lands
    # displaced in the midframe.
    edge = jnp.zeros((3, 16, 24)).at[:, :, 12:].set(1.0)
    flow = jnp.zeros((2, 16, 24)).at[0].set(4.0)  # content moved -4 px
    mid2 = np.asarray(filters.interpolate_frame(edge, edge, flow, 0.5))
    assert np.isfinite(mid2).all()

    from rt64tpu.utils.testscenes import build_sample_scene

    dev, scene, view = build_sample_scene(width=64, height=48)
    r_ = view._renderer if view._renderer else None
    dev.draw()
    assert view._renderer.interpolated_midframe() is None  # one frame
    dev.draw()
    mf = view._renderer.interpolated_midframe()
    assert mf is not None and mf.shape == (48, 64, 3)
    assert mf.dtype == np.uint8
    # Static scene, jittered camera: the midframe resembles the frame.
    cur = view.framebuffer()[..., :3]
    assert np.abs(mf.astype(int) - cur.astype(int)).mean() < 30


def test_pipelined_present_ring_and_overflow_hold():
    """Pipelined present ring (depth 2): frame N presents frame N-2,
    and an alpha-capacity overflow frame is HELD (previous framebuffer
    re-presented) instead of shipping with missing alpha layers
    (round-4 VERDICT ask #9, pipelined leg)."""
    from rt64tpu.utils.testscenes import build_sample_scene

    dev, scene, view = build_sample_scene(
        width=64, height=32, gi_samples=0, with_glass=True
    )
    view.max_reflections = 0
    view.pipelined_present = True

    r = None
    frames = []
    for i in range(6):
        dev.draw()
        r = view._renderer
        fb = view.framebuffer()
        frames.append(None if fb is None else fb[..., :3].copy())
    assert r.pipelined and r.pipeline_depth == 2
    # The ring is primed after depth frames: early presents may be
    # empty, later ones must exist and be non-black.
    assert frames[-1] is not None and frames[-1].std() > 1
    # The ring never holds more than `depth` in-flight frames.
    assert len(r._pending) <= r.pipeline_depth
    # The boost settled (overflow frames were held, not presented;
    # convergence still happens through the growth path).
    assert r._alpha_boost <= 16
