"""Train the learned upscaler (the DLSS-slot model) on rendered pairs.

Self-supervised from the renderer itself: each sample renders the same
scene/camera at low resolution (network input: color + depth + flow +
reactive) and at the target resolution (ground truth), then the CNN
learns the residual over bilinear upscaling. Run:

    python -m rt64tpu.models.train_upscaler --steps 200

Parameters persist to models/_upscaler_params.npz, which
learned_upscaler.get_params() picks up automatically.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from rt64tpu.models import learned_upscaler as lu


def render_pair(seed: int, lo=(96, 128), hi=(192, 256)):
    """Render one (inputs, target) pair from a randomized sample scene."""
    from rt64tpu import descriptors as d
    from rt64tpu.ops import math3d
    from rt64tpu.utils.testscenes import build_sample_scene

    rng = np.random.default_rng(seed)
    angle = rng.uniform(0, 2 * np.pi)
    height = rng.uniform(2.0, 5.0)
    dist = rng.uniform(7.0, 11.0)
    eye = (dist * np.sin(angle), height, dist * np.cos(angle))

    frames = {}
    for tag, (h, w) in (("lo", lo), ("hi", hi)):
        dev, scene, view = build_sample_scene(
            width=w, height=h, sphere_reflection=rng.uniform(0.0, 0.5)
        )
        vm = math3d.look_at_rh(eye, (0.0, 1.2, 0.0), (0.0, 1.0, 0.0))
        view.set_perspective(vm, 45.0 * np.pi / 180.0, 0.1, 1000.0, True)
        dev.draw()
        out = view._renderer._last
        frames[tag] = out
    lo_out = frames["lo"]
    g = lo_out.gbuffers
    hl, wl = lo
    inputs = dict(
        rt_color=np.asarray(lo_out.rt_output),
        depth=np.asarray(g.depth.reshape(hl, wl)),
        flow=np.asarray(g.flow.reshape(2, hl, wl)),
        reactive=np.asarray(g.reactive.reshape(hl, wl)),
    )
    target = np.asarray(frames["hi"].rt_output)
    return inputs, target


def loss_fn(params, batch, dh, dw):
    preds = []
    for inputs, _ in batch:
        pred = lu._run(
            params,
            jnp.asarray(inputs["rt_color"]),
            jnp.asarray(inputs["depth"]),
            jnp.asarray(inputs["flow"]),
            jnp.asarray(inputs["reactive"]),
            dh, dw,
        )
        preds.append(pred)
    targets = jnp.stack([jnp.asarray(t) for _, t in batch])
    preds = jnp.stack(preds)
    return jnp.mean((preds - targets) ** 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=lu._PARAMS_CACHE)
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    print(f"rendering {args.pairs} training pairs...")
    batch = [render_pair(seed) for seed in range(args.pairs)]
    dh, dw = batch[0][1].shape[1:]

    params = lu.get_params()
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    grad_fn = jax.jit(jax.value_and_grad(lambda p: loss_fn(p, batch, dh, dw)))

    for step in range(args.steps):
        loss, grads = grad_fn(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step}: mse {float(loss):.6f}")

    leaves = jax.tree_util.tree_leaves(params)
    flat = {f"{i:04d}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(args.out, **flat)
    print("saved", args.out)


if __name__ == "__main__":
    main()
