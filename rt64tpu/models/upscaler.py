"""Upscaler slot: quality policy, temporal (FSR2-style) and learned.

Replaces the Upscaler plugin interface (rt64_upscaler.h:43-50) and its
three vendor backends (rt64_dlss.cpp, rt64_fsr.cpp, rt64_xess.cpp):

  * quality -> resolution policy (getQualityAuto, rt64_upscaler.cpp:11-36,
    plus FSR's forced UltraQuality=77% / Native, rt64_fsr.cpp:98-126)
  * jitter phase count (ffxFsr2GetJitterPhaseCount's 8*(disp/render)^2;
    DLSS/XeSS report 64 phases, rt64_dlss.cpp:189-191)
  * TEMPORAL: a hand-written FSR2-style temporal accumulator in pure
    JAX consuming the same inputs the reference feeds FSR2 (color,
    flow, reactive/lock masks, jitter) — the UPSCALER_FSR slot
  * LEARNED: a Flax CNN in the DLSS/XeSS slot (models/learned_upscaler)
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from rt64tpu import descriptors as d
from rt64tpu.ops import filters

QUALITY_SCALE = {
    d.UPSCALER_MODE_ULTRA_PERFORMANCE: 1.0 / 3.0,
    d.UPSCALER_MODE_PERFORMANCE: 1.0 / 2.0,
    d.UPSCALER_MODE_BALANCED: 1.0 / 1.7,
    d.UPSCALER_MODE_QUALITY: 1.0 / 1.5,
    d.UPSCALER_MODE_ULTRA_QUALITY: 0.77,
    d.UPSCALER_MODE_NATIVE: 1.0,
}

# XeSS publishes its own quality->input-resolution policy
# (xessGetInputResolution, rt64_xess.cpp:94-124): UltraQuality is a
# 1.3x ratio (not FSR's forced 77%), and UltraPerformance/Native are
# forced 1/3 and 1:1 by the reference itself (rt64_xess.cpp:103-111).
XESS_QUALITY_SCALE = {
    d.UPSCALER_MODE_ULTRA_PERFORMANCE: 1.0 / 3.0,
    d.UPSCALER_MODE_PERFORMANCE: 1.0 / 2.0,
    d.UPSCALER_MODE_BALANCED: 1.0 / 1.7,
    d.UPSCALER_MODE_QUALITY: 1.0 / 1.5,
    d.UPSCALER_MODE_ULTRA_QUALITY: 1.0 / 1.3,
    d.UPSCALER_MODE_NATIVE: 1.0,
}


def quality_auto(display_width: int, display_height: int) -> int:
    """getQualityAuto thresholds (rt64_upscaler.cpp:11-36)."""
    pixels = display_width * display_height
    if pixels <= 1280 * 720:
        return d.UPSCALER_MODE_ULTRA_QUALITY
    if pixels <= 1920 * 1080:
        return d.UPSCALER_MODE_QUALITY
    if pixels <= 2560 * 1440:
        return d.UPSCALER_MODE_BALANCED
    if pixels <= 3840 * 2160:
        return d.UPSCALER_MODE_PERFORMANCE
    return d.UPSCALER_MODE_ULTRA_PERFORMANCE


def quality_resolution(quality: int, display_width: int, display_height: int,
                       upscaler: int = d.UPSCALER_FSR):
    """getQualityInformation analog: render resolution for a mode.

    TPU divergence (documented): the render resolution snaps to the
    frame graph's tile grid (width multiple of 64, height multiple of
    8 — framegraph.RenderConfig.TILE_W/TILE_H) so the swizzled packet
    layout stays active at internal resolutions. The reference rounds
    to exact integer pixels (rt64_view.cpp:114-141); snapping moves the
    scale by at most ~5% and keeps the tracer's 512-ray blocks compact
    screen tiles.
    """
    if quality == d.UPSCALER_MODE_AUTO:
        quality = quality_auto(display_width, display_height)
    table = (XESS_QUALITY_SCALE if upscaler == d.UPSCALER_XESS
             else QUALITY_SCALE)
    scale = table[quality]
    rw = max(1, int(display_width * scale))
    rh = max(1, int(display_height * scale))
    if quality != d.UPSCALER_MODE_NATIVE:
        rw = max(64, int(round(rw / 64.0)) * 64)
        rh = max(8, int(round(rh / 8.0)) * 8)
        rw = min(rw, display_width)
        rh = min(rh, display_height)
    return rw, rh


def jitter_phase_count(render_width: int, display_width: int,
                       upscaler: int = d.UPSCALER_FSR) -> int:
    """FSR: ffxFsr2GetJitterPhaseCount = ceil(8 * (display/render)^2).
    DLSS and XeSS report a fixed 64-phase sequence (rt64_dlss.cpp:
    189-191; rt64_xess.cpp:126-130 adopts the same count)."""
    if upscaler in (d.UPSCALER_DLSS, d.UPSCALER_XESS):
        return 64
    ratio = display_width / max(render_width, 1)
    return max(1, int(math.ceil(8.0 * ratio * ratio)))


def temporal_channels(upscaler: int) -> int:
    """Channel count of the donated display-res temporal state: the
    FSR slot carries color only; the XeSS slot also carries depth for
    its disocclusion test; the learned (DLSS) slot is stateless."""
    if upscaler in (d.UPSCALER_FSR, d.UPSCALER_AUTO):
        return 3
    if upscaler == d.UPSCALER_XESS:
        return 4
    return 0


@partial(jax.jit, static_argnums=(6, 7))
def temporal_accumulate(
    history_color,  # (3, DH, DW) previous output
    rt_color,  # (3, H, W) current render-res frame
    flow,  # (2, H, W) motion in render pixels
    reactive,  # (H, W)
    lock,  # (H, W)
    reset,  # () bool — resetAccumulation (rt64_upscaler.h:40)
    dh: int,
    dw: int,
):
    """FSR2-style temporal upscale: reproject history via flow, rectify
    against the current frame's 3x3 neighborhood (anti-ghosting), blend
    with a reactive-driven alpha; the lock mask marks thin features
    that trust unclamped history (the transparency-and-composition mask
    fed to FSR2 at rt64_fsr.cpp:132-166)."""
    h, w = rt_color.shape[1], rt_color.shape[2]
    # ONE stacked resize for all four render-res inputs: the separable
    # matmul form makes the channel count nearly free on the MXU.
    res = filters.bilinear_resize(
        jnp.concatenate([rt_color, flow, reactive[None], lock[None]], 0),
        dh, dw,
    )
    upscaled, flow_d, reactive_d, lock_d = res[:3], res[3:5], res[5], res[6]

    yy = (jnp.arange(dh, dtype=jnp.float32) + 0.5) / dh
    xx = (jnp.arange(dw, dtype=jnp.float32) + 0.5) / dw
    su = jnp.broadcast_to(xx[None, :], (dh, dw))
    sv = jnp.broadcast_to(yy[:, None], (dh, dw))
    # Flow is in render pixels; convert to uv.
    pu = su + flow_d[0] / w
    pv = sv + flow_d[1] / h
    oob = (pu < 0.0) | (pu > 1.0) | (pv < 0.0) | (pv > 1.0)
    # NOTE: the history gather must stay f32 — this is a FEEDBACK loop
    # (the output becomes next frame's history), and bf16 storage's
    # 0.4% rounding compounds through the (1-alpha) recurrence into a
    # visible drift of the static-scene fixed point
    # (test_temporal_accumulate_converges). One-shot gathers (motion
    # blur taps) can compress; this one cannot.
    reprojected = filters.bilinear_planar(
        history_color, jnp.clip(pu, 0.0, 1.0).reshape(-1),
        jnp.clip(pv, 0.0, 1.0).reshape(-1),
    ).reshape(3, dh, dw)

    # 3x3 neighborhood clamp of the upscaled current frame.
    pad = jnp.pad(upscaled, ((0, 0), (1, 1), (1, 1)), mode="edge")
    lo = upscaled
    hi = upscaled
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nb = pad[:, 1 + dy : dh + 1 + dy, 1 + dx : dw + 1 + dx]
            lo = jnp.minimum(lo, nb)
            hi = jnp.maximum(hi, nb)
    clamped = jnp.clip(reprojected, lo, hi)
    hist = clamped * (1.0 - lock_d)[None] + reprojected * lock_d[None]
    alpha = jnp.clip(0.1 + reactive_d * 0.8, 0.1, 0.9)[None]
    alpha = jnp.where(oob[None] | reset, 1.0, alpha)
    return hist * (1.0 - alpha) + upscaled * alpha


@partial(jax.jit, static_argnums=(6, 7))
def xess_accumulate(
    history,  # (4, DH, DW): rgb + depth of the previous OUTPUT
    rt_color,  # (3, H, W) current render-res frame
    depth,  # (H, W) current render-res screen depth
    flow,  # (2, H, W) motion in render pixels
    responsive,  # (H, W) responsive-pixel mask (reactive)
    reset,  # () bool — resetHistory (rt64_xess.cpp:144)
    dh: int,
    dw: int,
):
    """The XeSS-slot backend — a third, architecturally distinct
    upscaler (vs the FSR slot's color-clamp accumulator and the DLSS
    slot's CNN), consuming exactly the inputs the reference feeds
    xessD3D12Execute (rt64_xess.cpp:132-152): color, velocity, DEPTH,
    and the responsive-pixel mask.

      * spatial: Catmull-Rom (4-tap cubic) upsample of the current
        frame — sharper single-frame detail than bilinear at the same
        separable-matmul cost (filters.bilinear_resize kernel arg)
      * temporal: history reprojected via flow and validated by a
        DEPTH disocclusion test (XeSS's inputs are depth-driven; the
        FSR slot instead clamps against the color neighborhood)
      * responsive pixels bias the blend toward the current frame
        (XESS responsive mask semantics)
    """
    h, w = rt_color.shape[1], rt_color.shape[2]
    # Cubic kernels overshoot at edges; clamp so the history never
    # accumulates negative energy.
    cur = jnp.maximum(
        filters.bilinear_resize(rt_color, dh, dw, kernel="catmull"), 0.0
    )
    aux = filters.bilinear_resize(
        jnp.concatenate([depth[None], flow, responsive[None]], 0), dh, dw,
    )
    depth_d, flow_d, resp_d = aux[0], aux[1:3], aux[3]

    yy = (jnp.arange(dh, dtype=jnp.float32) + 0.5) / dh
    xx = (jnp.arange(dw, dtype=jnp.float32) + 0.5) / dw
    su = jnp.broadcast_to(xx[None, :], (dh, dw))
    sv = jnp.broadcast_to(yy[:, None], (dh, dw))
    pu = su + flow_d[0] / w
    pv = sv + flow_d[1] / h
    oob = (pu < 0.0) | (pu > 1.0) | (pv < 0.0) | (pv > 1.0)
    reproj = filters.bilinear_planar(
        history, jnp.clip(pu, 0.0, 1.0).reshape(-1),
        jnp.clip(pv, 0.0, 1.0).reshape(-1),
    ).reshape(4, dh, dw)
    hist_rgb, hist_depth = reproj[:3], reproj[3]

    # Depth disocclusion: the surface seen last frame at the
    # reprojected position must match this frame's depth, else the
    # history belongs to a different surface.
    disoccluded = jnp.abs(hist_depth - depth_d) > (
        0.02 * jnp.maximum(depth_d, 1e-3) + 1e-4
    )
    alpha = jnp.clip(0.1 + resp_d * 0.8, 0.1, 0.9)
    alpha = jnp.where(disoccluded | oob | reset, 1.0, alpha)[None]
    out = hist_rgb * (1.0 - alpha) + cur * alpha
    return out, jnp.concatenate([out, depth_d[None]], 0)


def temporal_upscale_step(temporal_history, frame_out, cfg):
    """Drive temporal_accumulate from FrameOutputs; returns
    (display image, new history)."""
    from rt64tpu.pipeline.framegraph import to_image

    dh, dw = cfg.display_height, cfg.display_width
    reset = temporal_history is None
    hist = (
        temporal_history
        if temporal_history is not None
        else jnp.zeros((3, dh, dw), jnp.float32)
    )
    out = temporal_accumulate(
        hist,
        frame_out.rt_output,
        to_image(cfg, frame_out.gbuffers.flow),
        to_image(cfg, frame_out.gbuffers.reactive),
        to_image(cfg, frame_out.gbuffers.lock),
        jnp.bool_(reset),
        dh, dw,
    )
    return out, out


def learned_upscale(frame_out, cfg):
    """DLSS/XeSS slot: learned CNN upscaler; falls back to the temporal
    path when no trained parameters are loaded."""
    from rt64tpu.models import learned_upscaler

    return learned_upscaler.upscale(frame_out, cfg)
