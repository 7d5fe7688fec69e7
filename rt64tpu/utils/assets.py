"""Asset IO: PNG/BMP read-write and DDS (BC1/BC2/BC3) decode.

The DDSTextureLoader + stb_image equivalents (contrib/DDSTextureLoader,
rt64_texture.cpp:146-187; frame dumping rt64_device.cpp:1156-1215).
BC decompression prefers the native C++ kernel (native/ddsdecode.cpp)
and falls back to the NumPy implementation below.
"""

from __future__ import annotations

import os
import struct

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def read_image(path: str) -> np.ndarray:
    """Load any PIL-supported image as (H, W, 4) uint8 RGBA."""
    img = Image.open(path).convert("RGBA")
    return np.asarray(img, np.uint8)


def write_png(path: str, rgba: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.asarray(rgba)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def write_bmp(path: str, rgba: np.ndarray) -> None:
    """Frame-dump format of the reference (BMP, rt64_device.cpp:1156)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(np.asarray(rgba)[..., :3]).save(path, format="BMP")


# --- DDS ------------------------------------------------------------------

_DDS_MAGIC = 0x20534444  # 'DDS '


def decode_dds(data: bytes) -> np.ndarray:
    """Decode a DDS file (BC1/BC2/BC3 aka DXT1/3/5, or raw RGBA8) to
    (H, W, 4) uint8. Only the top mip is used (mipmaps are disabled in
    the reference, rt64_device.cpp:758-762)."""
    magic, = struct.unpack_from("<I", data, 0)
    if magic != _DDS_MAGIC:
        raise ValueError("not a DDS file")
    (size, flags, height, width) = struct.unpack_from("<4I", data, 4)
    pf_flags, fourcc = struct.unpack_from("<2I", data, 4 + 76)
    rgb_bitcount, rmask, gmask, bmask, amask = struct.unpack_from(
        "<5I", data, 4 + 84 + 4
    )
    payload_off = 4 + 124
    fourcc_s = struct.pack("<I", fourcc)
    if fourcc_s == b"DX10":
        dxgi_format, = struct.unpack_from("<I", data, payload_off)
        payload_off += 20
        fmt = {71: b"DXT1", 74: b"DXT3", 77: b"DXT5"}.get(dxgi_format)
        if fmt is None:
            raise ValueError(f"unsupported DX10 dxgi format {dxgi_format}")
        fourcc_s = fmt
    payload = np.frombuffer(data, np.uint8, offset=payload_off)
    if pf_flags & 0x4:  # DDPF_FOURCC
        if fourcc_s == b"DXT1":
            return _decode_bc1(payload, width, height)
        if fourcc_s in (b"DXT2", b"DXT3"):
            return _decode_bc2(payload, width, height)
        if fourcc_s in (b"DXT4", b"DXT5"):
            return _decode_bc3(payload, width, height)
        raise ValueError(f"unsupported DDS fourcc {fourcc_s!r}")
    if rgb_bitcount == 32:
        raw = payload[: width * height * 4].reshape(height, width, 4)
        order = [_mask_index(m) for m in (rmask, gmask, bmask)]
        out = np.empty((height, width, 4), np.uint8)
        out[..., 0] = raw[..., order[0]]
        out[..., 1] = raw[..., order[1]]
        out[..., 2] = raw[..., order[2]]
        out[..., 3] = raw[..., _mask_index(amask)] if amask else 255
        return out
    raise ValueError("unsupported uncompressed DDS layout")


def _mask_index(mask: int) -> int:
    return {0xFF: 0, 0xFF00: 1, 0xFF0000: 2, 0xFF000000: 3}.get(mask, 0)


def _bc_color_palette(blocks: np.ndarray, bc1_punch: bool):
    """blocks: (B, 2) uint16 c0/c1 -> palette (B, 4, 4) uint8 rgba."""
    c0 = blocks[:, 0].astype(np.uint32)
    c1 = blocks[:, 1].astype(np.uint32)

    def expand(c):
        r = ((c >> 11) & 0x1F).astype(np.float32) * (255.0 / 31.0)
        g = ((c >> 5) & 0x3F).astype(np.float32) * (255.0 / 63.0)
        b = (c & 0x1F).astype(np.float32) * (255.0 / 31.0)
        return np.stack([r, g, b], -1)

    p0 = expand(c0)
    p1 = expand(c1)
    four = ~(bc1_punch & (c0 <= c1))
    p2 = np.where(four[:, None], (2 * p0 + p1) / 3.0, (p0 + p1) / 2.0)
    p3 = np.where(four[:, None], (p0 + 2 * p1) / 3.0, 0.0)
    pal = np.stack([p0, p1, p2, p3], axis=1)  # (B, 4, 3)
    alpha = np.full(pal.shape[:2] + (1,), 255.0, np.float32)
    if bc1_punch:
        alpha[:, 3, 0] = np.where(four, 255.0, 0.0)
    return np.concatenate([pal, alpha], -1).round().astype(np.uint8)


def _bc_color_indices(rows: np.ndarray):
    """rows: (B, 4) uint8 -> (B, 16) 2-bit indices."""
    idx = np.zeros((rows.shape[0], 16), np.uint8)
    for r in range(4):
        for c in range(4):
            idx[:, r * 4 + c] = (rows[:, r] >> (c * 2)) & 0x3
    return idx


def _assemble_blocks(texels: np.ndarray, width: int, height: int) -> np.ndarray:
    """texels: (B, 16, 4) block texels -> (H, W, 4) image."""
    bw = (width + 3) // 4
    bh = (height + 3) // 4
    img = texels.reshape(bh, bw, 4, 4, 4).transpose(0, 2, 1, 3, 4)
    return np.ascontiguousarray(img.reshape(bh * 4, bw * 4, 4)[:height, :width])


def _decode_bc1(payload, width, height):
    bw, bh = (width + 3) // 4, (height + 3) // 4
    nblocks = bw * bh
    raw = payload[: nblocks * 8].reshape(nblocks, 8)
    colors = raw[:, :4].copy().view(np.uint16).reshape(nblocks, 2)
    pal = _bc_color_palette(colors, bc1_punch=True)
    idx = _bc_color_indices(raw[:, 4:8])
    texels = np.take_along_axis(pal, idx[..., None].astype(np.int64), 1)
    return _assemble_blocks(texels, width, height)


def _decode_bc2(payload, width, height):
    bw, bh = (width + 3) // 4, (height + 3) // 4
    nblocks = bw * bh
    raw = payload[: nblocks * 16].reshape(nblocks, 16)
    colors = raw[:, 8:12].copy().view(np.uint16).reshape(nblocks, 2)
    pal = _bc_color_palette(colors, bc1_punch=False)
    idx = _bc_color_indices(raw[:, 12:16])
    texels = np.take_along_axis(pal, idx[..., None].astype(np.int64), 1)
    a16 = raw[:, :8].copy().view(np.uint16).reshape(nblocks, 4)
    alpha = np.zeros((nblocks, 16), np.uint8)
    for r in range(4):
        for c in range(4):
            alpha[:, r * 4 + c] = (((a16[:, r] >> (c * 4)) & 0xF) * 17).astype(np.uint8)
    texels[..., 3] = alpha
    return _assemble_blocks(texels, width, height)


def _decode_bc3(payload, width, height):
    bw, bh = (width + 3) // 4, (height + 3) // 4
    nblocks = bw * bh
    raw = payload[: nblocks * 16].reshape(nblocks, 16)
    colors = raw[:, 8:12].copy().view(np.uint16).reshape(nblocks, 2)
    pal = _bc_color_palette(colors, bc1_punch=False)
    idx = _bc_color_indices(raw[:, 12:16])
    texels = np.take_along_axis(pal, idx[..., None].astype(np.int64), 1)
    a0 = raw[:, 0].astype(np.float32)
    a1 = raw[:, 1].astype(np.float32)
    apal = np.zeros((nblocks, 8), np.float32)
    apal[:, 0] = a0
    apal[:, 1] = a1
    eight = a0 > a1  # 8-alpha mode vs 6-alpha + 0/255 mode
    for i in range(2, 8):
        v8 = ((8 - i) * a0 + (i - 1) * a1) / 7.0
        if i <= 5:
            v6 = ((6 - i) * a0 + (i - 1) * a1) / 5.0
        elif i == 6:
            v6 = np.zeros_like(a0)
        else:
            v6 = np.full_like(a0, 255.0)
        apal[:, i] = np.where(eight, v8, v6)
    bits = np.zeros(nblocks, np.uint64)
    for i in range(6):
        bits |= raw[:, 2 + i].astype(np.uint64) << np.uint64(8 * i)
    aidx = np.zeros((nblocks, 16), np.uint8)
    for t in range(16):
        aidx[:, t] = ((bits >> np.uint64(3 * t)) & np.uint64(0x7)).astype(np.uint8)
    alpha = np.take_along_axis(apal, aidx.astype(np.int64), 1)
    texels[..., 3] = alpha.round().astype(np.uint8)
    return _assemble_blocks(texels, width, height)
