"""Checkpoint/resume of renderer state.

The reference has no checkpointing (SURVEY.md section 5); the state
that *would* need saving is exactly the temporal history (prev
normal/depth/direct/indirect accumulations), the previous-frame view
matrices, and the frame counter (rt64_view.h:99-110,
rt64_view.cpp:977-990). This module saves/restores that set so a
long-running session (or a migrated serving replica) resumes with its
temporal accumulation intact instead of re-converging from scratch.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from rt64tpu.pipeline import framegraph as fg


def save_view_state(view, path: str) -> None:
    """Snapshot a view's temporal state to an .npz file."""
    r = view._renderer
    if r is None or r.history is None:
        raise ValueError("view has no rendered state to checkpoint")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blobs = {
        "normal": np.asarray(r.history.normal),
        "depth": np.asarray(r.history.depth),
        "direct": np.asarray(r.history.direct),
        "indirect": np.asarray(r.history.indirect),
        "frame_count": np.int64(view.frame_count),
        "prev_view_proj": (
            np.asarray(r._prev_view_proj)
            if r._prev_view_proj is not None else np.eye(4, dtype=np.float32)
        ),
        "prev_view_i": (
            np.asarray(r._prev_view_i)
            if r._prev_view_i is not None else np.eye(4, dtype=np.float32)
        ),
    }
    if r._temporal is not None:
        blobs["temporal_upscaler"] = np.asarray(r._temporal)
    np.savez(path, **blobs)


def restore_view_state(view, path: str) -> None:
    """Restore a snapshot taken by save_view_state."""
    data = np.load(path)
    from rt64tpu.pipeline.view import ViewRenderer

    if view._renderer is None:
        view._renderer = ViewRenderer(view)
    r = view._renderer
    r.history = fg.History(
        normal=jnp.asarray(data["normal"]),
        depth=jnp.asarray(data["depth"]),
        direct=jnp.asarray(data["direct"]),
        indirect=jnp.asarray(data["indirect"]),
    )
    view.frame_count = int(data["frame_count"])
    r._prev_view_proj = data["prev_view_proj"]
    r._prev_view_i = data["prev_view_i"]
    if "temporal_upscaler" in data:
        r._temporal = jnp.asarray(data["temporal_upscaler"])
