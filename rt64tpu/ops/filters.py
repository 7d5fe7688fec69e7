"""Image-space stages: compose, gaussian denoise filter, motion blur,
bilinear blits — planar (C, H, W) layout.

Each full-screen pass of the reference becomes a pure function; XLA
fuses them into the frame program instead of round-tripping through
render targets and barriers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rt64tpu.ops.vecmath import pvary

EPSILON = 1e-6


def compose(diffuse_rgb, diffuse_a, direct, indirect, reflection, refraction,
            transparent):
    """ComposePS (ComposePS.hlsl:18-37). All (3, N) planes + (N,) alpha.

    result = lerp(diffuse, diffuse*(direct+indirect), diffuse.a)
             + reflection + refraction + transparent, when diffuse.a>0.
    """
    lit = diffuse_rgb * (direct + indirect)
    a = diffuse_a[None]
    result = diffuse_rgb * (1.0 - a) + lit * a
    result = result + reflection + refraction + transparent
    return jnp.where(a > EPSILON, result, diffuse_rgb)


# 3x3 gaussian weights (GaussianFilterRGB3x3CS.hlsl; MS RTAO sample).
_W_CENTER = 0.195346
_W_EDGE = 0.123317
_W_CORNER = 0.077847


def gaussian_3x3(img):
    """3x3 gaussian with border renormalization. img: (C, H, W)."""
    c, h, w = img.shape
    pad = jnp.pad(img, ((0, 0), (1, 1), (1, 1)))
    ones = jnp.pad(jnp.ones((1, h, w), img.dtype), ((0, 0), (1, 1), (1, 1)))

    def taps(a):
        acc = jnp.zeros_like(a[:, 1:-1, 1:-1])
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                wgt = (
                    _W_CENTER if (dx == 0 and dy == 0)
                    else _W_EDGE if (dx == 0 or dy == 0)
                    else _W_CORNER
                )
                acc = acc + wgt * a[:, 1 + dy : h + 1 + dy, 1 + dx : w + 1 + dx]
        return acc

    return taps(pad) / jnp.maximum(taps(ones), 1e-12)


def rcas(img, sharpness):
    """Robust contrast-adaptive sharpen (RCAS) of a (3, H, W) image.

    The upscalerSharpness consumer: the reference feeds the knob into
    FSR2's RCAS pass (rt64_fsr.cpp:141-166) and DLSS's sharpness
    parameter (rt64_dlss.cpp:193-227); this is the AMD FSR1 RCAS
    formula (cross-neighborhood negative lobe, clamped so the 4-tap
    kernel never rings) scaled by `sharpness` in [0, 1] — exactly
    identity at 0.0, maximum stable sharpening at 1.0. Input must be
    display-range [0, 1] (the lobe bound's "1" is the range peak, as
    in FSR where RCAS runs post-tonemap); the framegraph clips before
    the tap.
    """
    c, h, w = img.shape
    pad = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), mode="edge")
    e = img
    b = pad[:, 0:h, 1 : w + 1]  # north
    d = pad[:, 1 : h + 1, 0:w]  # west
    f = pad[:, 1 : h + 1, 2 : w + 2]  # east
    hh = pad[:, 2 : h + 2, 1 : w + 1]  # south
    # PER-CHANNEL limiters (AMD's lobeR/G/B), then the most restrictive
    # (max, i.e. closest to zero) drives one shared lobe — a
    # luma-driven bound breaks because luma's peak is not 1.0.
    mn = jnp.minimum(jnp.minimum(jnp.minimum(b, d), jnp.minimum(f, hh)), e)
    mx = jnp.maximum(jnp.maximum(jnp.maximum(b, d), jnp.maximum(f, hh)), e)
    # out = (lobe*sum4 + e) / (4*lobe + 1) stays in [0, 1] when
    # lobe >= max(-mn/(4*mx), (1-mx)/(4*mn-4)) per channel (both are
    # <= 0; including e in mn/mx only tightens them).
    hit_min = -(mn / jnp.maximum(4.0 * mx, 1e-4))
    hit_max = (1.0 - mx) / jnp.minimum(4.0 * mn - 4.0, -1e-4)
    lobe = jnp.maximum(hit_min, hit_max).max(axis=0, keepdims=True)
    # RCAS_LIMIT = 0.25 - 1/16: the fixed stability clamp.
    lobe = jnp.clip(lobe, -(0.25 - 1.0 / 16.0), 0.0) * sharpness
    return (lobe * (b + d + f + hh) + e) / (4.0 * lobe + 1.0)


def quad_pack_planar(img, dtype=None):
    """(C, H, W) -> (H*W, 4C): per pixel, the channel values of itself
    and its +x, +y, +xy neighbors (edge-clamped). Cheap elementwise
    shifts; lets a bilinear fetch be ONE row gather (TPU gathers cost
    per-row, not per-byte). ROW-major (pixels on the major axis) so the
    gather reads rows directly — gathering columns of a (4C, N) layout
    made XLA materialize a transposed copy of the result at display
    scale.

    dtype (e.g. jnp.bfloat16) compresses the packed STORAGE — halving
    the gathered row bytes for color-like data; bilinear_quad blends in
    f32 either way (bf16's 0.4% relative step is below the 8-bit output
    quantum for display-range colors)."""
    c, h, w = img.shape
    xs = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    ys = jnp.concatenate([img[:, 1:, :], img[:, -1:, :]], axis=1)
    xys = jnp.concatenate([ys[:, :, 1:], ys[:, :, -1:]], axis=2)
    quad = jnp.concatenate([img, xs, ys, xys], 0).reshape(4 * c, h * w)
    if dtype is not None:
        quad = quad.astype(dtype)
    return quad.T


def bilinear_quad(packed, c, h, w, su, sv):
    """Bilinear fetch from a quad-packed image (quad_pack_planar):
    one (N, 4C) row gather + vector blend. Returns (C, N)."""
    x = jnp.clip(su * w - 0.5, 0.0, w - 1.0)
    y = jnp.clip(sv * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    g = packed[y0 * w + x0]  # (N, 4C) — THE gather
    p00 = g[:, :c]
    p10 = g[:, c : 2 * c]
    p01 = g[:, 2 * c : 3 * c]
    p11 = g[:, 3 * c :]
    out = (
        p00 * (1 - fx) * (1 - fy)
        + p10 * fx * (1 - fy)
        + p01 * (1 - fx) * fy
        + p11 * fx * fy
    )
    return out.T


def bilinear_planar(img, su, sv):
    """Bilinear fetch of a (C, H, W) planar image at uv (N,) each."""
    c, h, w = img.shape
    return bilinear_quad(quad_pack_planar(img), c, h, w, su, sv)


def _uv_grid(h, w):
    yy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    su = jnp.broadcast_to(xx[None, :], (h, w)).reshape(-1)
    sv = jnp.broadcast_to(yy[:, None], (h, w)).reshape(-1)
    return su, sv


def _resize_weights(n_out: int, n_in: int, kernel: str = "bilinear"):
    """(n_out, n_in) interpolation matrix for the fixed
    (i + 0.5) / n_out grid. "bilinear" matches bilinear_quad's
    clip/floor/frac math on that grid; "catmull" is the 4-tap
    Catmull-Rom cubic (sharper upsamples — the XeSS-slot spatial
    kernel), edge-clamped and renormalized at the borders."""
    import numpy as np

    x = (np.arange(n_out, dtype=np.float64) + 0.5) / n_out * n_in - 0.5
    x = np.clip(x, 0.0, n_in - 1.0)
    x0 = np.floor(x).astype(np.int64)
    f = (x - x0).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    if kernel == "bilinear":
        x1 = np.minimum(x0 + 1, n_in - 1)
        np.add.at(m, (rows, x0), 1.0 - f)
        np.add.at(m, (rows, x1), f)
        return m
    assert kernel == "catmull", kernel
    # Catmull-Rom: w(-1..2) over taps x0-1..x0+2 as polynomials in f.
    w_m1 = 0.5 * (-f + 2.0 * f * f - f * f * f)
    w_0 = 0.5 * (2.0 - 5.0 * f * f + 3.0 * f * f * f)
    w_p1 = 0.5 * (f + 4.0 * f * f - 3.0 * f * f * f)
    w_p2 = 0.5 * (-f * f + f * f * f)
    for off, wv in ((-1, w_m1), (0, w_0), (1, w_p1), (2, w_p2)):
        np.add.at(m, (rows, np.clip(x0 + off, 0, n_in - 1)), wv)
    return m


def bilinear_resize(img, out_h: int, out_w: int, kernel: str = "bilinear"):
    """Fixed-output-grid blit. img: (C, H, W).

    Separable matmul form: resize = R @ img @ C^T with static banded
    weight matrices — the fixed-grid special case needs no gather at
    all, and the two small matmuls ride the MXU (measured ~4x cheaper
    than the quad-pack gather at 480p->640p scale; gathers cost
    per-row on TPU). kernel="catmull" swaps the weights for the 4-tap
    Catmull-Rom cubic at identical op structure."""
    c, h, w = img.shape
    if (out_h, out_w) == (h, w):
        return img
    rm = jnp.asarray(_resize_weights(out_h, h, kernel))  # (OH, H)
    cm = jnp.asarray(_resize_weights(out_w, w, kernel))  # (OW, W)
    t = jnp.einsum("oh,chw->cow", rm, img, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum(
        "cow,pw->cop", t, cm, precision=jax.lax.Precision.HIGHEST
    )


def motion_blur(output, flow_img, resolution_xy, strength, samples: int):
    """PostProcessPS (PostProcessPS.hlsl:13-35): blur along flow.

    output: (3, H, W); flow_img: (2, H, W) in render pixels.
    """
    if samples <= 0:
        return output

    def run(output):
        _, h, w = output.shape
        su, sv = _uv_grid(h, w)
        flow_u = flow_img[0].reshape(-1) / resolution_xy[0]
        flow_v = flow_img[1].reshape(-1) / resolution_xy[1]
        flow_len = jnp.sqrt(flow_u * flow_u + flow_v * flow_v)
        step = strength / samples
        start_u = su - flow_u * (strength * 0.5)
        start_v = sv - flow_v * (strength * 0.5)
        # Packed once, outside the tap loop; bf16 storage halves the
        # display-res gather bytes per tap (color-only data).
        packed = quad_pack_planar(output, jnp.bfloat16)

        def body(s, acc):
            sf = s.astype(jnp.float32) * step
            uu = jnp.clip(start_u + flow_u * sf, 0.0, 1.0)
            vv = jnp.clip(start_v + flow_v * sf, 0.0, 1.0)
            return acc + bilinear_quad(packed, 3, h, w, uu, vv)

        acc = jax.lax.fori_loop(
            0, samples, body, pvary(jnp.zeros((3, h * w)))
        )
        blurred = (acc / samples).reshape(3, h, w)
        active = (flow_len > 1e-6).reshape(1, h, w)
        return jnp.where(active, blurred, output)

    # The off-state skip is STATIC (RenderConfig.motion_blur_enabled,
    # set by the view from the strength knob): a lax.cond here costs a
    # multi-ms scheduling fence with display-size operands. A traced
    # strength of exactly 0 still yields the identity (zero flow step,
    # blurred == resampled output; flow_len masking keeps static pixels
    # untouched), matching PostProcessPS.hlsl:14's guard semantics.
    return run(output)


def interpolate_frame(prev_img, cur_img, flow_img, t=0.5):
    """Flow-based intermediate frame between two presented frames
    (BASELINE config 5's interpolated-frame-pacing clause; the
    reference ships no equivalent — DLSS-G-class pacing is the analog).

    prev_img/cur_img: (3, H, W) display images; flow_img: (2, H, W)
    display-resolution motion vectors with the frame graph's
    convention (GBuffers.flow: previous screen position of the content
    at p is p + flow). The midpoint (fraction `t` from prev toward
    cur) is the symmetric single-proxy warp: sample prev at
    p + t*flow and cur at p - (1-t)*flow, blended — the standard cheap
    interpolator (true bidirectional flow would need the previous
    frame's flow field too). Costs one display-res bilinear gather
    pair; degenerates to a plain blend where flow is zero.
    """
    c, h, w = cur_img.shape
    yy = (jnp.arange(h, dtype=jnp.float32) + 0.5)
    xx = (jnp.arange(w, dtype=jnp.float32) + 0.5)
    px = jnp.broadcast_to(xx[None, :], (h, w))
    py = jnp.broadcast_to(yy[:, None], (h, w))
    fx, fy = flow_img[0], flow_img[1]

    def warp(img, sx, sy):
        su = jnp.clip(sx / w, 0.0, 1.0).reshape(-1)
        sv = jnp.clip(sy / h, 0.0, 1.0).reshape(-1)
        return bilinear_planar(img, su, sv).reshape(c, h, w)

    from_prev = warp(prev_img, px + t * fx, py + t * fy)
    from_cur = warp(cur_img, px - (1.0 - t) * fx, py - (1.0 - t) * fy)
    return from_prev * (1.0 - t) + from_cur * t
