"""ViewRenderer: drives the jitted frame graph for an api.View.

The View::update / View::render split of the reference
(rt64_view.cpp:1053-1178 / :1180-1667): update() assembles scene
buffers (instance classification + uploads), render() invokes the
jitted frame with donated temporal history and retains the outputs for
presentation, picking, and the inspector.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from rt64tpu import descriptors as d
from rt64tpu.models import upscaler as ups
from rt64tpu.ops import bluenoise, math3d
from rt64tpu.pipeline import framegraph as fg
from rt64tpu.pipeline.scene_buffers import ScenePacker


class ViewRenderer:
    """pipelined=False matches the reference's full-sync-per-frame model
    (rt64_device.cpp:1006-1025); pipelined=True presents frame N-1 while
    N renders, hiding device/tunnel latency (an improvement the
    reference's architecture could not express)."""

    def __init__(self, view, pipelined: bool = False,
                 pipeline_depth: int = 2):
        self.view = view
        self.pipelined = pipelined
        # In-flight present ring: frame N presents frame N-depth, so a
        # readback has `depth` frame times to cross the host transport
        # before anything blocks on it. Depth 2 measured the tunneled
        # axon readback (~15-25 ms serialized at depth 1, round 4) off
        # the critical path; local-PCIe hosts are latency-insensitive
        # to it either way.
        self.pipeline_depth = max(1, pipeline_depth)
        self._pending = []
        device = view.scene.device
        self.packer = ScenePacker(device.limits)
        self.bn_table = jnp.asarray(bluenoise.packed_table())
        self.history: Optional[fg.History] = None
        self.active_instances = []
        self._sb = None
        self._sky_rec = -1
        self._jitted = {}
        self._temporal = None  # TemporalUpscaler history (display res)
        self._prev_view_proj = None
        self._prev_view_i = None
        self._last = None
        self._alpha_boost = 1
        self._pick_src = None  # (FrameOutputs, cfg) of the presented frame
        self._pick_plane = None  # cached on-demand picking readback
        self._bg_cache = {}  # (h, w) -> device-resident zero plane

    # -- update: the View::update analog -----------------------------------
    def update(self):
        view = self.view
        scene = view.scene
        # Instance classification (rt64_view.cpp:1081-1147): raytraced
        # instances feed the tracer; raster-enabled shaders without
        # raytracing go to the bg (RASTER_BACKGROUND flag) or fg sets.
        bound = [
            inst for inst in scene.instances
            if inst.desc.mesh is not None and inst.desc.shader is not None
        ]
        active = [
            inst for inst in bound
            if inst.desc.shader.raytrace_enabled
            and not (inst.desc.flags & d.INSTANCE_RASTER_BACKGROUND)
        ]
        raster = [
            inst for inst in bound
            if inst.desc.shader.raster_enabled
            and not inst.desc.shader.raytrace_enabled
            or (inst.desc.flags & d.INSTANCE_RASTER_BACKGROUND)
        ]
        raster_bg = [
            i for i in raster if i.desc.flags & d.INSTANCE_RASTER_BACKGROUND
        ]
        raster_fg = [
            i for i in raster
            if not (i.desc.flags & d.INSTANCE_RASTER_BACKGROUND)
        ]
        everything = active + raster
        self.active_instances = active
        self.packer.pack_quad_pool(everything)
        self._sky_rec = self.packer.add_env_texture(view.sky_plane_texture)
        self.packer.set_sky_plane_dense(view.sky_plane_texture)
        self.packer.pack_geometry(active)
        self._sb = self.packer.pack_frame(
            everything, scene.lights_array(), raster_bg=raster_bg,
            raster_fg=raster_fg,
        )

    # -- render: the View::render analog ------------------------------------
    def render(self, delta_time_ms: float):
        view = self.view
        cfg = self._config()
        gp = self._global_params(cfg)
        if self.history is None or self.history.depth.shape[0] != (
            cfg.rt_height * cfg.rt_width
        ):
            self.history = fg.History.zeros(cfg.rt_height, cfg.rt_width)

        fn = self._get_jitted(cfg, view.visualization_mode)
        bg_planes = self._background_planes(cfg)
        # The temporal-upscaler history (FSR/XeSS slots) is donated
        # device state inside the jitted frame — no host round-trip
        # between render and upscale (the reference's production
        # internal-res path, rt64_view.cpp:114-141, 1584-1618).
        scaling = (cfg.display_height, cfg.display_width) != (
            cfg.rt_height, cfg.rt_width
        )
        tch = ups.temporal_channels(cfg.upscaler)
        if scaling and tch:
            shape = (tch, cfg.display_height, cfg.display_width)
            fresh = self._temporal is None or self._temporal.shape != shape
            if fresh:
                # Fresh history: zeros + resetAccumulation, so frame 0
                # and frame 1 share one trace (None vs array would
                # otherwise recompile the frame).
                self._temporal = jnp.zeros(shape, jnp.float32)
            temporal = self._temporal
            gp = gp._replace(temporal_reset=np.bool_(fresh))
        else:
            temporal = None
        out, present = fn(self._sb, gp, self.history, self.bn_table,
                          bg_planes, temporal)
        self.history = out.history
        self._temporal = out.temporal
        # Previous frame's display image (device-resident) for
        # interpolated_midframe; dropped when the resolution changes.
        prev = self._last.image if self._last is not None else None
        self._prev_image = (
            prev if prev is not None and prev.shape == out.image.shape
            else None
        )
        self._last = out

        if not self.pipelined:
            # Compacted-shade capacity auto-grow + SAME-FRAME re-render:
            # if this frame dropped alpha hits (shade_hits_compacted
            # overflow), double the capacity boost, re-specialize, and
            # render the frame AGAIN before presenting — a one-frame
            # hitch (jit of the grown variant) instead of a presented
            # image missing alpha layers. The capacity-bucket pattern
            # (limits.py) instead of a per-slot runtime fallback (a
            # lax.cond fence costs ~9 ms each on a 480p frame). The
            # drop-scalar read blocks on the frame, which the present
            # readback below does anyway in this (reference-parity,
            # full-sync) mode. The re-render consumes the dropped
            # frame's OUTPUT history (the input was donated) — one
            # extra temporal-accumulation step, invisible next frame.
            while int(np.asarray(out.alpha_dropped)) > 0 and (
                self._alpha_boost < 16
            ):
                self._alpha_boost = min(self._alpha_boost * 2, 16)
                from rt64tpu.utils.log import breadcrumb

                breadcrumb(f"alpha shade capacity overflow; boost -> "
                           f"{self._alpha_boost}; re-rendering frame")
                cfg = self._config()
                fn = self._get_jitted(cfg, view.visualization_mode)
                temporal = self._temporal
                out, present = fn(self._sb, gp, self.history,
                                  self.bn_table, bg_planes, temporal)
                self.history = out.history
                self._temporal = out.temporal
                self._last = out
        else:
            # Present the PREVIOUS frame; leave this one in flight. The
            # RGBA8 readback starts NOW (async) so it overlaps this
            # frame's device time instead of stalling at np.asarray.
            # Blocking on the IN-FLIGHT frame's drop scalar here would
            # serialize the host against the device (~40 ms/frame over
            # the tunneled transport), so overflow is detected at
            # present time below.
            if hasattr(present, "copy_to_host_async"):
                present.copy_to_host_async()
                # Prefetch the overflow counter too: the capacity check
                # reads it once this frame completes and presents.
                out.alpha_dropped.copy_to_host_async()
            self._pending.append((present, out, cfg))
            if len(self._pending) < self.pipeline_depth + 1:
                return
            present, out, cfg = self._pending.pop(0)
            if int(np.asarray(out.alpha_dropped)) > 0:
                # The completed frame is missing alpha layers. Its
                # inputs are gone (donated), so an exact re-render is
                # impossible without copying the history pytree every
                # frame; HOLD the previous framebuffer for one frame
                # (a hitch, not a wrong image) and grow the capacity
                # for the frames already queuing behind it.
                if self._alpha_boost < 16:
                    self._alpha_boost = min(self._alpha_boost * 2, 16)
                    from rt64tpu.utils.log import breadcrumb

                    breadcrumb(
                        f"alpha shade capacity overflow; boost -> "
                        f"{self._alpha_boost}; holding previous frame"
                    )
                    self._pick_src = (out, cfg)
                    self._pick_plane = None
                    return
        # present is the device-packed (DH, DW, 3) uint8 frame — 1/5 the
        # readback bytes of the old f32 path (the host<->device tunnel
        # runs ~40 MB/s; the f32 image alone cost ~100 ms/frame).
        frame = np.asarray(present)
        view._framebuffer = np.concatenate(
            [frame, np.full(frame.shape[:2] + (1,), 255, np.uint8)], axis=-1
        )
        # Picking readback is deferred until a host actually picks
        # (instance_plane below) — the reference also copies the
        # instance-id plane at most once per frame and only on demand
        # (rt64_view.cpp:1946-1981).
        self._pick_src = (out, cfg)
        self._pick_plane = None

    def interpolated_midframe(self, t: float = 0.5):
        """Flow-interpolated frame between the two most recent renders
        (BASELINE config 5's interpolated-frame-pacing clause): a host
        wanting smoother pacing presents this between draws. Computed
        on device (filters.interpolate_frame) from the previous image,
        the current image, and the current frame's motion vectors;
        returns (DH, DW, 3) uint8, or None until two frames exist.
        NOTE on this tunneled host the extra present readback costs
        more than it buys (see RESULTS.md streamed floor); on a
        local-PCIe host it is ~one display-res gather pair."""
        if self._last is None or getattr(self, "_prev_image", None) is None:
            return None
        out, cfg = self._last, self._config()
        fn = self._jitted.get(("midframe", cfg.display_width,
                               cfg.display_height))
        if fn is None:
            from rt64tpu.ops import filters

            def mid(prev_img, cur_img, flow_plane, tt):
                flow_disp = filters.bilinear_resize(
                    fg.to_image(cfg, flow_plane),
                    cfg.display_height, cfg.display_width,
                )
                img = filters.interpolate_frame(
                    prev_img, cur_img, flow_disp, tt
                )
                rgb = jnp.clip(img * 255.0 + 0.5, 0.0, 255.0)
                return jnp.transpose(rgb.astype(jnp.uint8), (1, 2, 0))

            fn = jax.jit(mid)
            self._jitted[("midframe", cfg.display_width,
                          cfg.display_height)] = fn
        return np.asarray(
            fn(self._prev_image, out.image, out.gbuffers.flow,
               jnp.float32(t))
        )

    def instance_plane(self):
        """(rt_h, rt_w) int32 instance-id plane of the presented frame,
        fetched on demand and cached until the next present."""
        if self._pick_src is None:
            return None
        if self._pick_plane is None:
            out, cfg = self._pick_src
            self._pick_plane = np.asarray(
                fg.to_image(cfg, out.gbuffers.instance.astype(jnp.float32))
            ).astype(np.int32)
        return self._pick_plane

    def _get_jitted(self, cfg, vis_mode):
        key = (cfg, vis_mode)
        fn = self._jitted.get(key)
        if fn is None:
            def frame_and_present(sb, gp, hist, bn, bg, temporal):
                out = fg.render_frame(
                    sb, gp, hist, bn, bg, temporal, cfg=cfg,
                    visualization_mode=vis_mode,
                )
                # Pack the presented RGBA8 frame ON DEVICE (same
                # clip/round math the host used) so present reads back
                # 1 byte/channel instead of 4.
                rgb = jnp.clip(
                    out.image * 255.0 + 0.5, 0.0, 255.0
                ).astype(jnp.uint8)
                # RGB only: the constant alpha plane is appended on the
                # host (a ~1 ms memcpy) instead of riding the ~40 MB/s
                # tunnel readback.
                return out, jnp.transpose(rgb, (1, 2, 0))

            fn = jax.jit(
                frame_and_present,
                # Donate temporal history AND the upscaler history: both
                # are consumed and re-produced every frame.
                donate_argnums=(2, 5),
            )
            self._jitted[key] = fn
        return fn

    def _config(self) -> fg.RenderConfig:
        view = self.view
        vd = view.desc
        dw, dh = view.width, view.height
        if vd.upscaler != d.UPSCALER_OFF:
            rw, rh = ups.quality_resolution(vd.upscaler_mode, dw, dh,
                                            upscaler=vd.upscaler)
        else:
            rw = max(1, int(dw * vd.resolution_scale))
            rh = max(1, int(dh * vd.resolution_scale))
        # Static pass skips from scene-wide material knowledge: the
        # reference early-outs per pixel inside the raygen (refraction /
        # reflection alpha == 0); here the whole dispatch is elided at
        # trace time when NO material can seed it. Toggling a material's
        # factor re-specializes the jit (rare, bucketed like the other
        # static config fields).
        mats = [i.desc.material for i in view.scene.instances]
        any_refr = any(m.refraction_factor > 1e-6 for m in mats)
        any_refl = any(m.reflection_factor > 1e-6 for m in mats)
        return fg.RenderConfig(
            rt_width=rw,
            rt_height=rh,
            display_width=dw,
            display_height=dh,
            di_samples=int(vd.di_samples),
            gi_samples=int(vd.gi_samples),
            # The reference walks min(sLightCount, maxLightCount) per
            # pixel (Lights.hlsli:137); statically cap the selection
            # loop by the actual light count to avoid dead rounds.
            max_lights=max(1, min(int(vd.max_lights), len(view.scene.lights))),
            max_reflections=view.max_reflections if any_refl else 0,
            refraction_enabled=any_refr,
            denoiser_enabled=bool(vd.denoiser_enabled),
            motion_blur_enabled=float(vd.motion_blur_strength) > 0.0,
            upscaler=int(vd.upscaler),
            sharpen_enabled=(
                vd.upscaler != d.UPSCALER_OFF
                and float(vd.upscaler_sharpness) > 0.0
            ),
            alpha_cap=self.packer.alpha_cap,
            alpha_shade_boost=self._alpha_boost,
            use_pallas_tracer=jax.default_backend() not in ("cpu",),
        )

    def _global_params(self, cfg) -> fg.GlobalParams:
        view = self.view
        scene = view.scene
        desc = scene.desc
        vmat = view.view_matrix.astype(np.float32)
        proj = math3d.perspective_fov_rh(
            view.fov_radians, cfg.display_width / cfg.display_height,
            view.near_dist, view.far_dist,
        )
        view_i = np.linalg.inv(vmat)
        proj_i = np.linalg.inv(proj)
        view_proj = vmat @ proj
        # Reprojection bookkeeping (rt64_view.cpp:977-990).
        if view.can_reproject and self._prev_view_proj is not None:
            prev_view_proj = self._prev_view_proj
            prev_view_i = self._prev_view_i
        else:
            prev_view_proj = view_proj
            prev_view_i = view_i
        self._prev_view_proj = view_proj
        self._prev_view_i = view_i

        cam_u, cam_v, cam_w = math3d.camera_uvw(
            view_i, view.fov_radians, cfg.display_width / cfg.display_height,
            view.near_dist, view.far_dist,
        )
        # Jitter only while an upscaler runs (rt64_view.cpp:1273-1281).
        if view.desc.upscaler != d.UPSCALER_OFF:
            phases = ups.jitter_phase_count(
                cfg.rt_width, cfg.display_width, upscaler=cfg.upscaler
            )
            jitter = math3d.halton_jitter(view.frame_count, phases)
        else:
            jitter = (0.0, 0.0)

        vd = view.desc
        denoiser = bool(vd.denoiser_enabled)
        f32 = np.float32
        # HOST numpy leaves, not eager jnp arrays: each jnp.asarray is
        # an eager device op (an RPC over the tunneled axon transport —
        # ~27 of them cost ~9 ms/frame in the streamed loop). The jit
        # call transfers numpy leaves itself with no per-leaf dispatch.
        return fg.GlobalParams(
            view=vmat,
            view_i=view_i.astype(f32),
            prev_view_i=prev_view_i.astype(f32),
            projection=proj,
            projection_i=proj_i.astype(f32),
            view_proj=view_proj.astype(f32),
            prev_view_proj=prev_view_proj.astype(f32),
            camera_u=np.asarray(cam_u, f32),
            camera_v=np.asarray(cam_v, f32),
            camera_w=np.asarray(cam_w, f32),
            pixel_jitter=np.asarray(jitter, f32),
            ambient_base=np.asarray(desc.ambient_base_color, f32),
            ambient_no_gi=np.asarray(desc.ambient_no_gi_color, f32),
            eye_light_diffuse=np.asarray(desc.eye_light_diffuse_color, f32),
            eye_light_specular=np.asarray(desc.eye_light_specular_color, f32),
            sky_diffuse_mult=np.asarray(desc.sky_diffuse_multiplier, f32),
            sky_hsl_mod=np.asarray(desc.sky_hsl_modifier, f32),
            sky_yaw_offset=np.float32(desc.sky_yaw_offset),
            gi_diffuse_strength=np.float32(desc.gi_diffuse_strength),
            gi_sky_strength=np.float32(desc.gi_sky_strength),
            motion_blur_strength=np.float32(vd.motion_blur_strength),
            sky_plane_rec=np.int32(self._sky_rec),
            frame_count=np.uint32(view.frame_count),
            di_reproject=np.bool_(False),  # DI_REPROJECTION_SUPPORT undefined
            gi_reproject=np.bool_(denoiser and vd.gi_samples > 0),
            binary_lock_mask=np.bool_(vd.upscaler != d.UPSCALER_FSR),
            upscaler_sharpness=np.float32(vd.upscaler_sharpness),
        )

    def _background_planes(self, cfg):
        """Base plane the in-frame raster-background pass composites
        onto (rt64_view.cpp:1292-1319; raster happens inside
        render_frame — framegraph.py raster.rasterize call). Black base,
        planar (3, H, W); cached device-resident (read-only input, never
        donated) so a streamed loop doesn't re-allocate it per frame."""
        key = (cfg.rt_height, cfg.rt_width)
        bg = self._bg_cache.get(key)
        if bg is None:
            bg = jnp.zeros((3,) + key, jnp.float32)
            self._bg_cache[key] = bg
        return bg
