"""Learned upscaler — the DLSS/XeSS slot (rt64_dlss.cpp / rt64_xess.cpp).

A compact Flax CNN consuming the same inputs the reference feeds NGX
(color, depth, flow, reactive mask, rt64_dlss.cpp:193-227): it predicts
a residual over the bilinear upscale, so even untrained parameters are
usable (identity-ish start). Convolutions run on the MXU in bf16.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from rt64tpu.ops import filters

_PARAMS_CACHE = os.path.join(os.path.dirname(__file__), "_upscaler_params.npz")


class UpscaleNet(nn.Module):
    """Residual predictor over bilinear upscaling.

    Inputs at display resolution: upscaled color (3), depth (1), flow
    (2), reactive (1). Output: rgb residual. Zero-init final conv keeps
    untrained parameters identity-ish. A dilated middle stage widens
    the receptive field (edge reconstruction) without extra resolution
    levels; all convs run on the MXU in bf16.
    """

    features: int = 32

    @nn.compact
    def __call__(self, x):  # x: (H, W, 7)
        h = nn.Conv(self.features, (3, 3), dtype=jnp.bfloat16)(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=jnp.bfloat16)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), kernel_dilation=(2, 2),
                    dtype=jnp.bfloat16)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features // 2, (3, 3), dtype=jnp.bfloat16)(h)
        h = nn.relu(h)
        h = nn.Conv(3, (3, 3), dtype=jnp.bfloat16,
                    kernel_init=nn.initializers.zeros)(h)
        return h.astype(jnp.float32)


_model = UpscaleNet()
_params = None


def get_params():
    global _params
    if _params is None:
        # The fused frame path calls this DURING render_frame tracing
        # (framegraph.py:1436); without ensure_compile_time_eval the
        # first traced caller would cache tracers in the module global
        # and every later trace would die on the leaked values.
        with jax.ensure_compile_time_eval():
            if os.path.exists(_PARAMS_CACHE):
                flat = dict(np.load(_PARAMS_CACHE))
                _params = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(
                        _model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((8, 8, 7)))
                    ),
                    [jnp.asarray(flat[k]) for k in sorted(flat)],
                )
            else:
                _params = _model.init(jax.random.PRNGKey(0),
                                      jnp.zeros((8, 8, 7)))
    return _params


@partial(jax.jit, static_argnums=(5, 6))
def _run(params, rt_color, depth, flow, reactive, dh: int, dw: int):
    # ONE stacked resize (separable-matmul bilinear_resize: channel
    # count is nearly free on the MXU).
    x = filters.bilinear_resize(
        jnp.concatenate([rt_color, depth[None], flow, reactive[None]], 0),
        dh, dw,
    )
    up = x[:3]
    # NOTE (round 4): the raw world-scale depth plane makes training
    # ill-conditioned (a fresh-init retrain explodes on the first
    # optimizer step, loss 0.36 -> 1.5e6, then ReLU-collapses to a
    # zero residual); input normalization experiments are in
    # benchmarks/RESULTS.md. The shipped weights were trained against
    # THIS raw-input contract, so it stays until a retrain lands
    # weights that beat them.
    x = jnp.moveaxis(x, 0, -1)  # conv wants HWC
    residual = _model.apply(params, x)
    return up + jnp.moveaxis(residual, -1, 0)


def upscale(frame_out, cfg):
    from rt64tpu.pipeline.framegraph import to_image

    return _run(
        get_params(),
        frame_out.rt_output,
        to_image(cfg, frame_out.gbuffers.depth),
        to_image(cfg, frame_out.gbuffers.flow),
        to_image(cfg, frame_out.gbuffers.reactive),
        cfg.display_height, cfg.display_width,
    )
