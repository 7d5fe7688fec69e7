"""Image-space stages: compose, gaussian denoise filter, motion blur.

Each full-screen pass of the reference becomes a pure function on
(H, W, C) arrays; XLA fuses them into the frame program instead of
round-tripping through render targets and barriers.
"""

from __future__ import annotations

import jax.numpy as jnp

EPSILON = 1e-6


def compose(diffuse, direct, indirect, reflection, refraction, transparent):
    """ComposePS (ComposePS.hlsl:18-37).

    result = lerp(diffuse, diffuse*(direct+indirect), diffuse.a)
             + reflection + refraction + transparent, when diffuse.a>0.
    """
    lit = diffuse[..., :3] * (direct + indirect)
    a = diffuse[..., 3:4]
    result = diffuse[..., :3] * (1.0 - a) + lit * a
    result = result + reflection + refraction + transparent
    return jnp.where(a > EPSILON, result, diffuse[..., :3])


# 3x3 gaussian weights (GaussianFilterRGB3x3CS.hlsl): the MS RTAO
# sample's kernel — corner .077847, edge .123317, center .195346.
_W_CORNER = 0.077847
_W_EDGE = 0.123317
_W_CENTER = 0.195346


def gaussian_3x3(img):
    """Separable-weight 3x3 gaussian with border renormalization.

    Matches GaussianFilterRGB3x3CS semantics: interior pixels use the
    full kernel; border pixels renormalize over in-bounds taps.
    img: (H, W, C).
    """
    h, w = img.shape[0], img.shape[1]
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))
    ones = jnp.pad(jnp.ones((h, w, 1), img.dtype), ((1, 1), (1, 1), (0, 0)))

    def taps(a):
        acc = jnp.zeros_like(a[1:-1, 1:-1])
        for dy, wy in ((-1, _W_EDGE), (0, _W_CENTER), (1, _W_EDGE)):
            for dx, wx in ((-1, _W_EDGE), (0, _W_CENTER), (1, _W_EDGE)):
                wgt = (
                    _W_CENTER if (dx == 0 and dy == 0)
                    else _W_EDGE if (dx == 0 or dy == 0)
                    else _W_CORNER
                )
                acc = acc + wgt * a[1 + dy : h + 1 + dy, 1 + dx : w + 1 + dx]
        return acc

    return taps(pad) / jnp.maximum(taps(ones), 1e-12)


def motion_blur(output, flow, resolution_xy, strength, samples: int):
    """PostProcessPS (PostProcessPS.hlsl:13-35): blur along flow.

    output: (H, W, 3); flow: (H, W, 2) in pixels; strength scalar;
    samples static. Pixels with negligible flow pass through.
    """
    if samples <= 0:
        return output
    h, w = output.shape[0], output.shape[1]
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    uv = jnp.stack(
        [jnp.broadcast_to((xx + 0.5) / w, (h, w)),
         jnp.broadcast_to((yy + 0.5) / h, (h, w))],
        axis=-1,
    )
    flow_uv = flow / resolution_xy
    flow_len = jnp.linalg.norm(flow_uv, axis=-1, keepdims=True)
    step = strength / samples
    start = uv - flow_uv * (strength * 0.5)

    import jax

    def body(s, acc):
        suv = jnp.clip(start + flow_uv * (s.astype(jnp.float32) * step), 0.0, 1.0)
        return acc + _bilinear(output, suv)

    acc = jax.lax.fori_loop(0, samples, body, jnp.zeros_like(output))
    blurred = acc / samples
    active = (flow_len > 1e-6) & (strength > 0.0)
    return jnp.where(active, blurred, output)


def _bilinear(img, uv):
    h, w = img.shape[0], img.shape[1]
    x = jnp.clip(uv[..., 0] * w - 0.5, 0.0, w - 1.0)
    y = jnp.clip(uv[..., 1] * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    return (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x1] * fx * (1 - fy)
        + img[y1, x0] * (1 - fx) * fy
        + img[y1, x1] * fx * fy
    )


def bilinear_resize(img, out_h: int, out_w: int):
    """Bilinear upscale/downscale (the non-upscaler final blit)."""
    yy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
    xx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w
    uv = jnp.stack(
        [jnp.broadcast_to(xx[None, :], (out_h, out_w)),
         jnp.broadcast_to(yy[:, None], (out_h, out_w))],
        axis=-1,
    )
    return _bilinear(img, uv)
