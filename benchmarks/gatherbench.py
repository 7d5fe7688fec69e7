"""Amortized gather microbenchmarks (device-side loops)."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from benchmarks.microbench import device_bench

rng = np.random.default_rng(0)
M = 1800  # 230k elements

# XLA row gathers of widths 16/32/64 from an 8k table
for W in (16, 32, 64):
    tab = jnp.asarray(rng.normal(0, 1, (8192, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 8192, (M, 128)).astype(np.int32))
    device_bench(
        f"xla_row{W}_8k",
        lambda c, tab=tab, idx=idx: (tab[(idx + c[1]) % 8192].sum(-1), c[1] + 1),
        (jnp.zeros((M, 128)), jnp.int32(0)),
        iters=20,
    )

# Mosaic lane gather (axis=1) inside pallas, amortized via inner fori
BLK = 8
A = jnp.asarray(rng.normal(0, 1, (M, 128)).astype(np.float32))
L = jnp.asarray(rng.integers(0, 128, (M, 128)).astype(np.int32))
def kern_lane(a_ref, l_ref, out_ref):
    def body(i, acc):
        return acc + jnp.take_along_axis(a_ref[:], (l_ref[:] + i) % 128, axis=1)
    out_ref[:] = jax.lax.fori_loop(0, 20, body, jnp.zeros_like(a_ref[:]))
def lane20(a, l):
    return pl.pallas_call(
        kern_lane, grid=(M // BLK,),
        in_specs=[pl.BlockSpec((BLK,128), lambda i: (i,0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((BLK,128), lambda i: (i,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK,128), lambda i: (i,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M,128), jnp.float32),
    )(a, l)
jf = jax.jit(lane20)
np.asarray(jf(A, L))
t0=time.time()
for _ in range(3): out = jf(A, L)
np.asarray(out)
print(f"mosaic_lane_gather: {(time.time()-t0)/3/20*1000:.3f} ms/iter", flush=True)

# Mosaic sublane gather (axis=0, matched shapes) per 32-row table block
T32 = jnp.asarray(rng.normal(0, 1, (32, 128)).astype(np.float32))
R32 = jnp.asarray(rng.integers(0, 32, (M, 128)).astype(np.int32))
def kern_sub(t_ref, r_ref, out_ref):
    t = t_ref[:]
    def body(i, acc):
        idx = (r_ref[pl.ds(0, 32), :] + i) % 32
        return acc + jnp.take_along_axis(t, idx, axis=0)
    out_ref[pl.ds(0, 32), :] = jax.lax.fori_loop(0, 20, body, jnp.zeros((32,128)))
    # fill rest
    out_ref[pl.ds(32, 32), :] = jnp.zeros((32,128))
def sub20(t, r):
    return pl.pallas_call(
        kern_sub, grid=(M // 64,),
        in_specs=[pl.BlockSpec((32,128), lambda i: (0,0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((64,128), lambda i: (i,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64,128), lambda i: (i,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M*64//64,128), jnp.float32),
    )(t, r)
try:
    R64 = jnp.asarray(rng.integers(0, 32, (M, 128)).astype(np.int32))
    jf2 = jax.jit(lambda t, r: sub20(t, r))
    np.asarray(jf2(T32, R64))
    t0=time.time()
    for _ in range(3): out = jf2(T32, R64)
    np.asarray(out)
    # effective elements: half the block gathers 20x
    print(f"mosaic_sublane_gather(32rows): {(time.time()-t0)/3/20*1000*2:.3f} ms/iter-equiv", flush=True)
except Exception as e:
    print("sublane gather FAILED:", str(e)[:200])
