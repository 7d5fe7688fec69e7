"""Quad-pool texture sampling: one row gather per bilinear fetch.

Replaces the descriptor-heap texture table (gTextures[512],
Textures.hlsli) and the 18 static samplers (rt64_shader.cpp:142-149).
The pool (scene_buffers.build_quad_entries) stores, per texel, the
packed RGBA of itself and its +x/+y/+xy neighbors under the texture's
addressing mode — so a bilinear sample is ONE dynamic row gather plus
vector unpack math, instead of four scalar gathers. TPU gathers cost
per-row, not per-byte, making this ~4x cheaper.

Addressing of the BASE coordinate still happens at sample time (the
baked neighbors only cover the +1 step). Point filtering selects the
nearest of the four fetched corners — free.

Mipmaps are intentionally absent: the reference builds its mip pass
under ``#if 0`` (rt64_device.cpp:758-762), so SampleGrad == bilinear.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ADDR_WRAP = 0
ADDR_MIRROR = 1
ADDR_CLAMP = 2

# Mip chains (opt-in, SHADER_MIP_LOD_ENABLED): level l is laid out in
# the pool right after level l-1's h*w entries, dims halving (floor,
# min 1) until 1x1 or MAX_MIP_LEVELS — the layout pack_quad_pool bakes
# (pipeline/scene_buffers.py) and mip_select reproduces arithmetically.
MAX_MIP_LEVELS = 8


def mip_select(offset, w, h, level):
    """Per-lane (offset, w, h) of mip level `level` given the LEVEL-0
    record fields. Pure unrolled arithmetic — no table, no gather: the
    chain layout is deterministic, so level offsets derive from the
    base record. Levels past the baked chain clamp to the last level.
    offset/w/h: int32 arrays or scalars; level: (N,) int32 >= 0."""
    offset = jnp.asarray(offset, jnp.int32)
    cur_w = jnp.asarray(w, jnp.int32)
    cur_h = jnp.asarray(h, jnp.int32)
    acc = offset
    out_off, out_w, out_h = offset, cur_w, cur_h
    out_off = jnp.broadcast_to(out_off, level.shape)
    out_w = jnp.broadcast_to(out_w, level.shape)
    out_h = jnp.broadcast_to(out_h, level.shape)
    for l in range(1, MAX_MIP_LEVELS):
        has_level = (cur_w > 1) | (cur_h > 1)  # level l was baked
        acc = acc + cur_w * cur_h
        cur_w = jnp.maximum(cur_w >> 1, 1)
        cur_h = jnp.maximum(cur_h >> 1, 1)
        sel = (level >= l) & has_level
        out_off = jnp.where(sel, acc, out_off)
        out_w = jnp.where(sel, cur_w, out_w)
        out_h = jnp.where(sel, cur_h, out_h)
    return out_off, out_w, out_h


def _remap(x, size, mode):
    """Apply addressing to the CONTINUOUS texel coordinate so the base
    index lands in [0, size-1] and the baked +1 neighbors stay exact.

    Mirror reflects the whole coordinate (equivalent to per-index
    mirroring of both bilinear corners); clamp collapses out-of-range
    samples onto the edge texel, which matches D3D because both true
    corners are then the same texel.
    """
    sizef = size.astype(x.dtype)
    wrapped = jnp.mod(x, sizef)
    reflected = sizef - 0.5 - jnp.abs(jnp.mod(x + 0.5, 2.0 * sizef) - sizef)
    mirrored = jnp.clip(reflected, 0.0, sizef - 1.0)
    clamped = jnp.clip(x, 0.0, sizef - 1.0)
    return jnp.where(
        mode == ADDR_WRAP, wrapped, jnp.where(mode == ADDR_MIRROR, mirrored, clamped)
    )


QPR = 32  # quads per 128-lane wide gather row


def pack_pool_wide(pool_np):
    """(P, 4) u32 quad pool -> CORNER-MAJOR wide rows (P/QPR, 4*QPR):
    row r, lane c*QPR + j holds corner c of quad r*QPR + j. Done once
    at upload (scene_buffers): the narrow (P, 4) row gather tiles its
    4-lane rows to the 128-lane tile, so every gathered row moved a
    full tile of mostly padding — profiled 2.1 ms/frame at 480p. Wide
    rows gather only real data, and the corner-major grouping makes the
    in-row quad select four contiguous 32-lane one-hot sums (no 3D
    reshape for XLA to materialize)."""
    p = pool_np.shape[0]
    assert p % QPR == 0, p
    return (
        pool_np.reshape(p // QPR, QPR, 4)
        .transpose(0, 2, 1)
        .reshape(p // QPR, 4 * QPR)
    )


def pool_quad_count(pool) -> int:
    """Number of quad entries for either pool layout."""
    if pool.ndim == 2 and pool.shape[1] == 4 * QPR:
        return pool.shape[0] * QPR
    return pool.shape[0]


def _gather_quads(pool, flat):
    """(4 corners, N) u32 of the pool quads at indices `flat`.

    Wide layout (pack_pool_wide): one 128-lane row gather + four
    32-lane one-hot sums on the VPU. Legacy (P, 4) layout: plain row
    gather (used by hosts that hand-build small pools)."""
    if pool.ndim == 2 and pool.shape[1] == 4 * QPR:
        rows = pool[flat // QPR]  # (N, 4*QPR)
        q = jnp.mod(flat, QPR)
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, QPR), 1) == q[:, None]
        )
        zero = jnp.uint32(0)
        return jnp.stack(
            [
                jnp.where(sel, rows[:, c * QPR : (c + 1) * QPR], zero).sum(
                    axis=1, dtype=jnp.uint32
                )
                for c in range(4)
            ],
            axis=0,
        )
    return pool[flat].T


def _unpack(u32):
    """(4, N) u32 -> (4 corners, 4 rgba, N) float in [0,1]."""
    r = (u32 & 0xFF).astype(jnp.float32)
    g = ((u32 >> 8) & 0xFF).astype(jnp.float32)
    b = ((u32 >> 16) & 0xFF).astype(jnp.float32)
    a = ((u32 >> 24) & 0xFF).astype(jnp.float32)
    return jnp.stack([r, g, b, a], axis=1) * (1.0 / 255.0)


def sample_quad(pool, records, rec_id, u, v, filter_linear, h_addr, v_addr):
    """Sample via the quad pool.

    pool: (P, 4) uint32; records: (Rec, 3) int32 (offset, W, H);
    rec_id: (N,) int32 (negative -> transparent black); u, v: (N,)
    texture coords; filter_linear: (N,) bool; h_addr/v_addr: (N,) int32.

    Returns (4, N): r, g, b, a planes.

    NOTE: the records[] lookup here is a per-pixel row gather, which
    costs milliseconds at frame scale regardless of the table size. Hot
    paths pass the record fields directly via sample_quad_cols (baked
    into triangle rows, pipeline/rows.py I_REC) or scalar_record.
    """
    safe = jnp.maximum(rec_id, 0)
    rec = records[safe]  # (N, 3) — tiny row gather over Rec entries
    return sample_quad_cols(
        pool, rec[:, 0], rec[:, 1], rec[:, 2], rec_id >= 0, u, v,
        filter_linear, h_addr, v_addr,
    )


def scalar_record(records, rec_id):
    """(offset, w, h) int32 scalars for one record id (traced scalar).
    O(1) dynamic slice — no per-pixel gather. Negative ids clamp to row
    0; callers keep masking by rec_id >= 0."""
    row = jax.lax.dynamic_slice_in_dim(
        records, jnp.maximum(rec_id, 0), 1, axis=0
    )[0]
    return row[0], row[1], row[2]


def sample_quad_cols(pool, offset, w, h, valid, u, v, filter_linear,
                     h_addr, v_addr):
    """sample_quad with the record fields given per lane (or scalar,
    broadcast): offset/w/h int-valued arrays, valid (N,) bool."""
    n = u.shape
    offset = jnp.broadcast_to(jnp.asarray(offset, jnp.int32), n)
    w = jnp.broadcast_to(jnp.asarray(w, jnp.int32), n)
    h = jnp.broadcast_to(jnp.asarray(h, jnp.int32), n)
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    x = _remap(u * wf - 0.5, w, h_addr)
    y = _remap(v * hf - 0.5, h, v_addr)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    flat = jnp.clip(offset + y0 * w + x0, 0, pool_quad_count(pool) - 1)

    quads = _gather_quads(pool, flat)  # (4, N) u32 — THE gather
    c = _unpack(quads)  # (4 corners, 4 rgba, N)
    c00, c10, c01, c11 = c[0], c[1], c[2], c[3]

    bilinear = (
        c00 * ((1 - fx) * (1 - fy))[None]
        + c10 * (fx * (1 - fy))[None]
        + c01 * ((1 - fx) * fy)[None]
        + c11 * (fx * fy)[None]
    )
    px = (fx >= 0.5)[None]
    py = (fy >= 0.5)[None]
    point = jnp.where(py, jnp.where(px, c11, c01), jnp.where(px, c10, c00))
    out = jnp.where(filter_linear[None], bilinear, point)
    return jnp.where(
        jnp.broadcast_to(valid, n)[None], out, jnp.zeros_like(out)
    )


def sample_env(pool, records, rec_id, u, v):
    """Background/sky sampler s0 analog: bilinear + wrap (the combo the
    packer bakes for env textures)."""
    n = u.shape
    return sample_quad(
        pool, records,
        jnp.broadcast_to(jnp.asarray(rec_id, jnp.int32), n),
        u, v,
        jnp.broadcast_to(jnp.bool_(True), n),
        jnp.broadcast_to(jnp.int32(ADDR_WRAP), n),
        jnp.broadcast_to(jnp.int32(ADDR_WRAP), n),
    )
