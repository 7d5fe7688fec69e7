"""Raster path: clip-space triangles with combiner shading + blending.

The reference classifies instances into raytraced / raster-background /
raster-foreground (rt64_view.cpp:1081-1147) and draws the raster sets
with runtime-generated VS/PS pairs (rt64_shader.cpp:312-442): the VS is
a passthrough (positions arrive in clip space), the PS runs the color
combiner, and the output blends with src-alpha / inv-src-alpha, no
depth test, no culling (rt64_shader.cpp:408-441). Background instances
render before raytracing (rays sample the result as the background
plane, rt64_view.cpp:1292-1319); foreground instances (HUD) render last
(rt64_view.cpp:1657-1661).

Here each raster triangle is rasterized over the full target with
planar edge functions and perspective-correct interpolation, then
alpha-blended in submission order (a lax.scan carries the image).
Triangle counts in this path are tiny (HUD quads, sky rectangles), so
per-triangle full-screen evaluation is cheap and fully vectorized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rt64tpu.ops import texture as tex_ops
from rt64tpu.ops.combiner import combiner_eval_planar
from rt64tpu.pipeline import rows as R

# Raster row layout (host-packed per frame): clip-space corners + attrs.
RR_POS = 0  # 12: xyzw x3 corners
RR_UV = 12  # 6
RR_IN1 = 18  # 12: rgba x3
RR_IN2 = 30  # 12
RR_INST = 42
RR_WIDTH = 44


def rasterize(
    image,  # (4, N) rgba target (premultiplied straight-alpha blend)
    raster_rows,  # (RB, RR_WIDTH) packed triangles, submission order
    raster_count,  # () int32 — valid rows
    instance_rows,  # (I, IROW)
    quad_pool, quad_records,
    width: int, height: int,
    noise_rand,  # (N,)
    pix=None,  # (N, 2) int pixel coords matching image's flat order
    row_offset=0,
):
    """Blend raster triangles over image; returns the new (4, N)."""
    rb = raster_rows.shape[0]
    if rb == 0:
        return image

    def run(image):
        return _rasterize_all(
            image, raster_rows, raster_count, instance_rows, quad_pool,
            quad_records, width, height, noise_rand, pix, row_offset,
        )

    return jax.lax.cond(raster_count > 0, run, lambda img: img, image)


def _rasterize_all(
    image, raster_rows, raster_count, instance_rows, quad_pool,
    quad_records, width, height, noise_rand, pix, row_offset,
):
    rb = raster_rows.shape[0]
    n = image.shape[1]
    if pix is not None:
        px = pix[:, 0].astype(jnp.float32) + 0.5
        py = pix[:, 1].astype(jnp.float32) + 0.5
    else:
        xx = jnp.arange(width, dtype=jnp.float32)
        yy = jnp.arange(height, dtype=jnp.float32) + row_offset
        px = jnp.broadcast_to(xx[None, :], (height, width)).reshape(-1) + 0.5
        py = jnp.broadcast_to(yy[:, None], (height, width)).reshape(-1) + 0.5

    def draw_one(img, ti):
        row = raster_rows[ti]
        inst = row[RR_INST].astype(jnp.int32)
        irow = instance_rows[jnp.maximum(inst, 0)]

        # Viewport transform (D3D: y-down NDC -> pixels). Instance
        # viewport/scissor rects (rt64_instance.cpp setters) stored in
        # the instance row; w/h == 0 means full target.
        vp = irow[R.I_VIEWPORT : R.I_VIEWPORT + 4]
        vx = vp[0]
        vy = vp[1]
        vw = jnp.where(vp[2] > 0.0, vp[2], float(width))
        vh = jnp.where(vp[3] > 0.0, vp[3], float(height))

        def corner(k):
            cx, cy, cz, cw = (row[RR_POS + 4 * k + c] for c in range(4))
            inv_w = 1.0 / jnp.where(jnp.abs(cw) > 1e-12, cw, 1.0)
            sx = vx + (cx * inv_w * 0.5 + 0.5) * vw
            sy = vy + (0.5 - cy * inv_w * 0.5) * vh
            return sx, sy, inv_w

        x0, y0, w0 = corner(0)
        x1, y1, w1 = corner(1)
        x2, y2, w2 = corner(2)

        # Edge functions at pixel centers (no culling: accept either
        # winding, matching CULL_MODE_NONE).
        def edge(ax, ay, bx, by):
            return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

        e01 = edge(x0, y0, x1, y1)
        e12 = edge(x1, y1, x2, y2)
        e20 = edge(x2, y2, x0, y0)
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        inside = jnp.where(
            area >= 0.0,
            (e01 >= 0.0) & (e12 >= 0.0) & (e20 >= 0.0),
            (e01 <= 0.0) & (e12 <= 0.0) & (e20 <= 0.0),
        )
        inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
        b0 = e12 * inv_area
        b1 = e20 * inv_area
        b2 = e01 * inv_area

        # Scissor (pixel-space clip).
        sc = irow[R.I_SCISSOR : R.I_SCISSOR + 4]
        has_sc = (sc[2] > 0.0) & (sc[3] > 0.0)
        in_sc = (
            (px >= sc[0]) & (px < sc[0] + sc[2])
            & (py >= sc[1]) & (py < sc[1] + sc[3])
        )
        inside = inside & (in_sc | ~has_sc) & (ti < raster_count)

        # Perspective-correct interpolation weights.
        pw = b0 * w0 + b1 * w1 + b2 * w2
        inv_pw = 1.0 / jnp.where(jnp.abs(pw) > 1e-12, pw, 1.0)
        q0 = b0 * w0 * inv_pw
        q1 = b1 * w1 * inv_pw
        q2 = b2 * w2 * inv_pw

        uv_u = row[RR_UV] * q0 + row[RR_UV + 2] * q1 + row[RR_UV + 4] * q2
        uv_v = row[RR_UV + 1] * q0 + row[RR_UV + 3] * q1 + row[RR_UV + 5] * q2

        def interp_rgba(base):
            return jnp.stack(
                [
                    row[base + c] * q0 + row[base + 4 + c] * q1
                    + row[base + 8 + c] * q2
                    for c in range(4)
                ],
                0,
            )

        in1 = interp_rgba(RR_IN1)
        in2 = interp_rgba(RR_IN2)
        zero4 = jnp.stack(
            [jnp.zeros_like(uv_u)] * 3 + [jnp.ones_like(uv_u)], 0
        )

        # Combiner + texture from the instance row.
        flags = irow[R.I_FLAGS].astype(jnp.int32)
        fl = lambda bit: (flags & bit) != 0
        sampler = irow[R.I_SAMPLER].astype(jnp.int32)
        filt = jnp.broadcast_to((sampler & 3) == 1, uv_u.shape)
        h_addr = jnp.broadcast_to((sampler >> 2) & 3, uv_u.shape)
        v_addr = jnp.broadcast_to((sampler >> 4) & 3, uv_u.shape)
        # Per-triangle records are scalars: O(1) slice, no (N,) gather.
        rec_d = jnp.where(
            fl(R.F_USE_T0), irow[R.I_TEX_D].astype(jnp.int32), -1
        )
        d_off, d_w, d_h = tex_ops.scalar_record(quad_records, rec_d)
        tex0 = tex_ops.sample_quad_cols(
            quad_pool, d_off, d_w, d_h, rec_d >= 0, uv_u, uv_v,
            filt, h_addr, v_addr,
        )
        # TEXEL1: real second binding when set (TPU extension), else the
        # reference's magenta stub (rt64_shader.cpp:484-487).
        magenta = jnp.stack(
            [jnp.ones_like(uv_u), jnp.zeros_like(uv_u), jnp.ones_like(uv_u),
             jnp.ones_like(uv_u)], 0,
        )
        rec_d2 = jnp.where(
            fl(R.F_USE_T1), irow[R.I_TEX_D2].astype(jnp.int32), -1
        )
        d2_off, d2_w, d2_h = tex_ops.scalar_record(quad_records, rec_d2)
        tex1_samp = tex_ops.sample_quad_cols(
            quad_pool, d2_off, d2_w, d2_h, rec_d2 >= 0, uv_u, uv_v,
            filt, h_addr, v_addr,
        )
        tex1 = jnp.where(rec_d2 >= 0, tex1_samp, magenta)
        cc_items = jnp.broadcast_to(
            R.unpack_cc(irow[R.I_CC], jnp)[:, None], (8, n)
        )
        color = combiner_eval_planar(
            cc_items,
            jnp.broadcast_to(fl(R.F_OPT_ALPHA), uv_u.shape),
            jnp.broadcast_to(fl(R.F_ALPHA_SAME), uv_u.shape),
            in1, in2, zero4, zero4, tex0, tex1,
        )

        # Alpha blend: src_alpha / inv_src_alpha for color, ONE /
        # inv_src_alpha for alpha (rt64_shader.cpp:408-414).
        sa = jnp.where(inside, color[3], 0.0)
        out_rgb = color[:3] * sa[None] + img[:3] * (1.0 - sa)[None]
        out_a = sa + img[3] * (1.0 - sa)
        return jnp.concatenate([out_rgb, out_a[None]], 0), None

    out, _ = jax.lax.scan(draw_one, image, jnp.arange(rb, dtype=jnp.int32))
    return out
