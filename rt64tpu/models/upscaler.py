"""Upscaler interface + implementations.

Replaces the Upscaler plugin slot (rt64_upscaler.h:43-50) and its three
vendor backends (rt64_dlss.cpp, rt64_fsr.cpp, rt64_xess.cpp):

  * quality -> resolution policy (getQualityAuto, rt64_upscaler.cpp:11-36,
    plus FSR's forced UltraQuality=77% / Native, rt64_fsr.cpp:98-126)
  * jitter phase count (ffxFsr2GetJitterPhaseCount's 8*(disp/render)^2)
  * BILINEAR: the non-upscaled final blit
  * TEMPORAL: a hand-written FSR2-style temporal upscaler in pure JAX
    consuming the same inputs (color, flow, reactive/lock masks, depth,
    jitter) — see pipeline/framegraph for the stateless entry and
    TemporalUpscaler for the history-carrying variant
  * LEARNED: a Flax CNN in the DLSS/XeSS slot (models/learned_upscaler)
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

from rt64tpu import descriptors as d
from rt64tpu.ops import filters

# QualityMode -> render scale (DLSS/XeSS-style ratios; FSR forces
# UltraQuality=77% and Native=100%, rt64_fsr.cpp:104-112).
QUALITY_SCALE = {
    d.UPSCALER_MODE_ULTRA_PERFORMANCE: 1.0 / 3.0,
    d.UPSCALER_MODE_PERFORMANCE: 1.0 / 2.0,
    d.UPSCALER_MODE_BALANCED: 1.0 / 1.7,
    d.UPSCALER_MODE_QUALITY: 1.0 / 1.5,
    d.UPSCALER_MODE_ULTRA_QUALITY: 0.77,
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


def quality_resolution(quality: int, display_width: int, display_height: int):
    """getQualityInformation analog: render resolution for a mode."""
    if quality == d.UPSCALER_MODE_AUTO:
        quality = quality_auto(display_width, display_height)
    scale = QUALITY_SCALE[quality]
    return max(1, int(display_width * scale)), max(1, int(display_height * scale))


def jitter_phase_count(render_width: int, display_width: int) -> int:
    """ffxFsr2GetJitterPhaseCount: ceil(8 * (display/render)^2); DLSS and
    XeSS report 64 phases (rt64_dlss.cpp:189-191)."""
    ratio = display_width / max(render_width, 1)
    return max(1, int(math.ceil(8.0 * ratio * ratio)))


def run_upscaler(cfg, gp, color, flow, reactive, lock, depth):
    """Stateless upscale used inside render_frame. Temporal/learned
    upscalers carry their own history outside the frame function; the
    in-frame slot upscales spatially (Lanczos-ish via bilinear for now)
    and the ViewRenderer applies the temporal accumulation stage."""
    return filters.bilinear_resize(color, cfg.display_height, cfg.display_width)


class TemporalUpscaler:
    """FSR2-style temporal upscaler state (history color at display res).

    accumulate() is a pure function suitable for jit: reproject history
    via flow, rectify against the current frame's neighborhood
    (clamping ghosting), blend with a reactive-driven alpha, honoring
    the lock mask as a "trust history" signal.
    """

    @staticmethod
    def accumulate(
        history_color,  # (DH, DW, 3) previous output
        upscaled,  # (DH, DW, 3) current frame bilinearly upscaled
        flow_display,  # (DH, DW, 2) motion in render pixels
        reactive,  # (DH, DW)
        lock,  # (DH, DW)
        render_wh,  # (2,) render resolution
        reset,  # () bool — resetAccumulation (rt64_upscaler.h:40)
    ):
        dh, dw = upscaled.shape[0], upscaled.shape[1]
        yy = jnp.arange(dh, dtype=jnp.float32)[:, None]
        xx = jnp.arange(dw, dtype=jnp.float32)[None, :]
        uv = jnp.stack(
            [jnp.broadcast_to((xx + 0.5) / dw, (dh, dw)),
             jnp.broadcast_to((yy + 0.5) / dh, (dh, dw))],
            axis=-1,
        )
        # Flow is in render-resolution pixels; convert to uv.
        prev_uv = uv + flow_display / render_wh
        reprojected = filters._bilinear(history_color, jnp.clip(prev_uv, 0.0, 1.0))
        oob = (
            (prev_uv[..., 0] < 0.0) | (prev_uv[..., 0] > 1.0)
            | (prev_uv[..., 1] < 0.0) | (prev_uv[..., 1] > 1.0)
        )
        # Neighborhood clamp (3x3 min/max of the current frame).
        pad = jnp.pad(upscaled, ((1, 1), (1, 1), (0, 0)), mode="edge")
        lo = upscaled
        hi = upscaled
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                nb = pad[1 + dy : dh + 1 + dy, 1 + dx : dw + 1 + dx]
                lo = jnp.minimum(lo, nb)
                hi = jnp.maximum(hi, nb)
        clamped = jnp.clip(reprojected, lo, hi)
        # Locked pixels trust unclamped history (thin features).
        hist = clamped * (1.0 - lock[..., None]) + reprojected * lock[..., None]
        alpha = jnp.clip(0.1 + reactive[..., None] * 0.8, 0.1, 0.9)
        alpha = jnp.where(oob[..., None] | reset, 1.0, alpha)
        return hist * (1.0 - alpha) + upscaled * alpha
