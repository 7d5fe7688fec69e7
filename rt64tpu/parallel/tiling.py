"""Multi-chip rendering: shard the pixel grid over a device mesh.

The reference is strictly single-GPU (SURVEY.md section 2.4); its only
parallelism is the pixel-parallel DispatchRays grid. The TPU-native
scaling axis is the same grid sharded across chips: each device renders
a horizontal band of rows against a REPLICATED scene (N64 scenes are
tiny next to HBM), and the temporal history is re-replicated with one
all-gather per frame so reprojection can follow motion across band
boundaries. All collectives ride ICI.

Layout:
  * scene buffers, camera, blue noise, background: replicated
  * per-pixel planes (image, g-buffers, history): sharded on the row
    axis -> flat pixel axis (rows x width stays contiguous per shard)
  * output: History comes back sharded; jax resharding (all-gather)
    replicates it for the next frame's gather-based reprojection
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from rt64tpu.pipeline import framegraph as fg

ROWS = "rows"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (ROWS,))


def shard_config(cfg: fg.RenderConfig, n_devices: int) -> fg.RenderConfig:
    """Per-device config: this shard's rows + the full grid height."""
    assert cfg.rt_height % n_devices == 0, (cfg.rt_height, n_devices)
    return replace(
        cfg,
        rt_height=cfg.rt_height // n_devices,
        display_height=cfg.display_height // n_devices,
        full_height=cfg.rt_height,
    )


def sharded_render(mesh: Mesh, cfg: fg.RenderConfig, visualization_mode: int = 0,
                   check_vma: bool = True):
    """Build the sharded frame function.

    Returns fn(sb, gp, history, bn_table, bg_planes) -> FrameOutputs
    where history arrives replicated-full and per-pixel outputs come
    back row-sharded (their global views are full-image arrays).

    check_vma=False is needed only for cfg.pallas_interpret runs: the
    Pallas INTERPRETER discharges kernels to dynamic_slice over block
    ids whose vma is empty while the operands vary, which the checker
    rejects (the compiled TPU path carries explicit out_shape vma and
    keeps the check on).
    """
    n_dev = mesh.devices.size
    shard_cfg = shard_config(cfg, n_dev)

    def per_device(sb, gp, history, bn_table, bg_planes):
        band = jax.lax.axis_index(ROWS)
        row_offset = band * shard_cfg.rt_height
        out = fg.render_frame(
            sb, gp, history, bn_table, bg_planes,
            cfg=shard_cfg, visualization_mode=visualization_mode,
            row_offset=row_offset,
        )
        # Per-band alpha-overflow counts -> one replicated total (ICI).
        dropped = jax.lax.psum(out.alpha_dropped, ROWS)
        return out._replace(
            alpha_dropped=dropped,
            gbuffers=out.gbuffers._replace(alpha_dropped=dropped),
        )

    # Scene/camera/history replicated in; pixel planes sharded out.
    rep = P()
    shard_flat = P(None, ROWS)  # (C, N) planes sharded on the pixel axis
    shard_1d = P(ROWS)
    shard_img = P(None, ROWS, None)  # (3, H, W) sharded on rows
    hist_in = fg.History(normal=rep, depth=rep, direct=rep, indirect=rep)
    hist_out = fg.History(
        normal=shard_flat, depth=shard_1d, direct=shard_flat,
        indirect=shard_flat,
    )
    g_out = fg.GBuffers(
        view_dir=shard_flat, position=shard_flat, normal=shard_flat,
        specular=shard_flat, diffuse_rgb=shard_flat, diffuse_a=shard_1d,
        instance=shard_1d, transparent=shard_flat, flow=shard_flat,
        reactive=shard_1d, lock=shard_1d, depth=shard_1d,
        refl_alpha=shard_1d, refr_alpha=shard_1d, row=shard_flat,
        alpha_dropped=rep,
    )
    out_specs = fg.FrameOutputs(
        image=shard_img,
        history=hist_out,
        gbuffers=g_out,
        direct_accum=shard_flat,
        indirect_accum=shard_flat,
        filtered_direct=shard_flat,
        filtered_indirect=shard_flat,
        reflection=shard_flat,
        refraction=shard_flat,
        rt_output=shard_img,
        alpha_dropped=rep,
    )

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(rep, rep, hist_in, rep, rep),
        out_specs=out_specs,
        # Varying-axis checking is ON (unless interpret — see above):
        # scan/fori carry inits that are per-device data are annotated
        # with vecmath.pvary at their definition sites, so shard_map
        # statically validates the frame.
        check_vma=check_vma,
    )
    return jax.jit(fn)


def replicate_history(mesh: Mesh, history: fg.History) -> fg.History:
    """Re-replicate a row-sharded history for the next frame (one
    all-gather over ICI, inserted by XLA at the resharding)."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), history)
