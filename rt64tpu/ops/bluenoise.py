"""Blue-noise sampling table.

The reference ships a 512x512 RGB texture holding 64 frames of 64x64
blue noise (res/bluenoise/LDR_64_64_64_RGB1.bmp, loaded at
rt64_device.cpp:794-797; indexed by BlueNoise.hlsli:7-12 — frame f is
the 64x64 tile at x=(f%8)*64, y=(f/8)*64). The package ships the SAME
sequence converted to an .npy table (_bluenoise_cache.npy, produced by
table_from_bmp) so every stochastic sample matches the reference's
deterministic per-(pixel, frame) values — SURVEY.md section 7 calls
keeping this asset identical a fidelity precondition. If the cache is
missing, an equivalent table is generated with void-and-cluster
(Ulichney '93) as a fallback.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

_TILE = 64
_FRAMES = 64
_CACHE = os.path.join(os.path.dirname(__file__), "_bluenoise_cache.npy")
_table = None


def _void_and_cluster(size: int, seed: int) -> np.ndarray:
    """One blue-noise rank tile in [0,1), shape (size, size).

    Incremental void-and-cluster: the toroidal gaussian energy field is
    updated in place as points are added/removed, so each step is one
    rolled-kernel add instead of a convolution.
    """
    rng = np.random.default_rng(seed)
    n = size * size
    sigma = 1.9
    ax = np.arange(size)
    d = np.minimum(ax, size - ax).astype(np.float64)
    d2 = d[:, None] ** 2 + d[None, :] ** 2
    kernel = np.exp(-d2 / (2.0 * sigma * sigma))
    yy = np.arange(size)[:, None]
    xx = np.arange(size)[None, :]

    def kern_at(y, x):
        return kernel[(yy - y) % size, (xx - x) % size]

    mask = np.zeros((size, size), bool)
    energy = np.zeros((size, size))
    count = n // 10
    init = rng.choice(n, count, replace=False)
    for fi in init:
        y, x = divmod(int(fi), size)
        mask[y, x] = True
        energy += kern_at(y, x)

    # Relax the initial set: move tightest cluster into largest void.
    for _ in range(4 * count):
        c = np.argmax(np.where(mask.ravel(), energy.ravel(), -np.inf))
        cy, cx = divmod(int(c), size)
        mask[cy, cx] = False
        energy -= kern_at(cy, cx)
        v = np.argmin(np.where(mask.ravel(), np.inf, energy.ravel()))
        if v == c:
            mask[cy, cx] = True
            energy += kern_at(cy, cx)
            break
        vy, vx = divmod(int(v), size)
        mask[vy, vx] = True
        energy += kern_at(vy, vx)

    rank = np.zeros(n, np.int64)
    # Phase 1: remove points, ranking count-1 .. 0.
    work = mask.copy()
    e = energy.copy()
    for r in range(count - 1, -1, -1):
        c = np.argmax(np.where(work.ravel(), e.ravel(), -np.inf))
        cy, cx = divmod(int(c), size)
        work[cy, cx] = False
        e -= kern_at(cy, cx)
        rank[c] = r
    # Phase 2: fill voids, ranking count .. n-1.
    work = mask.copy()
    e = energy.copy()
    for r in range(count, n):
        v = np.argmin(np.where(work.ravel(), np.inf, e.ravel()))
        vy, vx = divmod(int(v), size)
        work[vy, vx] = True
        e += kern_at(vy, vx)
        rank[v] = r
    return ((rank.astype(np.float64) + 0.5) / n).reshape(size, size).astype(np.float32)


def generate_table(frames: int = _FRAMES) -> np.ndarray:
    """(frames, 64, 64, 3): frames x H x W x rgb blue-noise values."""
    out = np.zeros((frames, _TILE, _TILE, 3), np.float32)
    for f in range(frames):
        for c in range(3):
            out[f, :, :, c] = _void_and_cluster(_TILE, seed=f * 3 + c + 1)
    return out


def table_from_bmp(path: str) -> np.ndarray:
    """Convert the reference's LDR_64_64_64_RGB1.bmp (24-bit, 512x512,
    8x8 grid of 64x64 frames) into the (64, 64, 64, 3) float table.
    Values are unorm8 / 255, matching Texture2D.Load on an RGBA8 view.
    """
    with open(path, "rb") as f:
        data = f.read()
    assert data[:2] == b"BM", "not a BMP"
    offset = int.from_bytes(data[10:14], "little")
    width = int.from_bytes(data[18:22], "little", signed=True)
    height = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    assert (width, abs(height), bpp) == (512, 512, 24), (width, height, bpp)
    stride = (width * 3 + 3) & ~3
    rows = np.frombuffer(
        data, np.uint8, count=abs(height) * stride, offset=offset
    ).reshape(abs(height), stride)[:, : width * 3].reshape(abs(height), width, 3)
    if height > 0:  # bottom-up storage
        rows = rows[::-1]
    rgb = rows[..., ::-1].astype(np.float32) / 255.0  # BGR -> RGB
    table = np.zeros((_FRAMES, _TILE, _TILE, 3), np.float32)
    for f_i in range(_FRAMES):
        bx = (f_i % 8) * _TILE
        by = (f_i // 8) * _TILE
        table[f_i] = rgb[by : by + _TILE, bx : bx + _TILE]
    return table


def get_table() -> np.ndarray:
    global _table
    if _table is None:
        if os.path.exists(_CACHE):
            _table = np.load(_CACHE)
        else:
            _table = generate_table()
            try:
                np.save(_CACHE, _table)
            except OSError:
                pass
    return _table


def packed_table() -> np.ndarray:
    """The table as a flat (F*T*T,) uint32 plane: r | g<<8 | b<<16.

    The source values are unorm8/255, so the u32 packing is exact. One
    scalar gather per sample replaces a 3-wide row gather from the 4-D
    float table (the float layout profiled at ~3.6 ms per blue-noise
    fetch on a 480p frame)."""
    t = np.round(get_table() * 255.0).astype(np.uint32)
    packed = t[..., 0] | (t[..., 1] << 8) | (t[..., 2] << 16)
    return packed.reshape(-1)


def grid_sampler(table, width, height, row_offset=0, swizzle=None):
    """Gather-free blue noise for the regular full-screen ray grid.

    getBlueNoise's index is (x%64, y%64, frame%64); frame is uniform
    across a dispatch. On the standard ray grid the entire fetch is one
    64x64 frame tile repeated across the screen — a dynamic_slice on
    the frame axis plus jnp.tile/crop, no per-pixel gather (the gather
    form profiled at ~3.6 ms per fetch at 480p; this is ~free).

    table: flat (F*T*T,) packed uint32 (packed_table) or the
    (64, 64, 64, 3) float table. row_offset shifts the y origin (row
    sharding); may be traced. swizzle: optional (H, W, 3) -> (N, 3)
    ray-order mapper for tiled pixel layouts.
    Returns sample(frame_count) -> (H*W, 3) float32; frame_count must
    be a scalar (as every reference dispatch passes it).
    """
    import jax

    t3 = table.reshape(_FRAMES, _TILE, _TILE) if table.ndim == 1 else None
    reps_y = -(-height // _TILE) + 1  # +1: roll never shrinks coverage
    reps_x = -(-width // _TILE)

    def sample(frame_count):
        f = jnp.remainder(jnp.asarray(frame_count, jnp.int32), _FRAMES)
        if t3 is not None:
            tu = jax.lax.dynamic_slice(t3, (f, 0, 0), (1, _TILE, _TILE))[0]
            inv = jnp.float32(1.0 / 255.0)
            tile = jnp.stack(
                [(tu & 0xFF).astype(jnp.float32) * inv,
                 ((tu >> 8) & 0xFF).astype(jnp.float32) * inv,
                 ((tu >> 16) & 0xFF).astype(jnp.float32) * inv], axis=-1,
            )
        else:
            tile = jax.lax.dynamic_slice(
                table, (f, 0, 0, 0), (1, _TILE, _TILE, 3)
            )[0]
        # value[y, x] = tile[(y + row_offset) % 64, x % 64]
        tile = jnp.roll(tile, -row_offset, axis=0)
        plane = jnp.tile(tile, (reps_y, reps_x, 1))[:height, :width]
        if swizzle is not None:
            return swizzle(plane)
        return plane.reshape(height * width, 3)

    return sample


def get_blue_noise(table, pixel_xy, frame_count):
    """getBlueNoise (BlueNoise.hlsli:7-12): (..., 3) values.

    table: a grid_sampler closure (fast path — pixel_xy is implied by
    the sampler's grid and ignored), flat (F*T*T,) uint32
    (packed_table), or the legacy (64, 64, 64, 3) float table;
    pixel_xy: (..., 2) int (x, y); frame_count: scalar or (...,) int.
    """
    if callable(table):
        return table(frame_count)
    f = jnp.remainder(jnp.asarray(frame_count, jnp.int32), _FRAMES)
    px = jnp.remainder(pixel_xy[..., 0], _TILE)
    py = jnp.remainder(pixel_xy[..., 1], _TILE)
    if table.ndim == 1:
        v = table[(f * _TILE + py) * _TILE + px]
        inv = jnp.float32(1.0 / 255.0)
        return jnp.stack(
            [(v & 0xFF).astype(jnp.float32) * inv,
             ((v >> 8) & 0xFF).astype(jnp.float32) * inv,
             ((v >> 16) & 0xFF).astype(jnp.float32) * inv], axis=-1,
        )
    return table[f, py, px]
