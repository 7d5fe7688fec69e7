"""Device-side microbenchmarks: each workload repeats inside one jit
(lax.scan with a data dependency) so tunnel latency amortizes away."""
import time
import jax, jax.numpy as jnp, numpy as np


def device_bench(name, step, init_carry, iters=50, warmup=True):
    """step: carry -> carry. Returns ms per iteration."""
    def run(carry):
        def body(c, _):
            return step(c), None
        out, _ = jax.lax.scan(body, carry, None, length=iters)
        return out
    jf = jax.jit(run)
    t0 = time.time()
    out = jf(init_carry)
    jax.tree.map(np.asarray, out)
    compile_s = time.time() - t0
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = jf(init_carry)
    jax.tree.map(np.asarray, out)
    ms = (time.time() - t0) / reps / iters * 1000
    print(f"{name}: {ms:.3f} ms/iter (compile {compile_s:.1f}s)", flush=True)
    return ms


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    M = 1800  # 230k lanes
    R = 2048

    # 1. scalar gather from 1M-entry table
    tab1 = jnp.asarray(rng.normal(0, 1, (1 << 20,)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 1 << 20, (M, 128)).astype(np.int32))
    device_bench(
        "gather_1M_scalar",
        lambda c: (tab1[(idx + c[1]) % (1 << 20)], c[1] + 1),
        (jnp.zeros((M, 128)), jnp.int32(0)),
    )

    # 2. row8 gather
    tab8 = jnp.asarray(rng.normal(0, 1, (1 << 20, 8)).astype(np.float32))
    device_bench(
        "gather_1M_row8",
        lambda c: (tab8[(idx + c[1]) % (1 << 20)].sum(-1), c[1] + 1),
        (jnp.zeros((M, 128)), jnp.int32(0)),
    )

    # 3. small-table gather (8192)
    tabT = jnp.asarray(rng.normal(0, 1, (8192,)).astype(np.float32))
    idxT = jnp.asarray(rng.integers(0, 8192, (M, 128)).astype(np.int32))
    device_bench(
        "gather_8k_scalar",
        lambda c: (tabT[(idxT + c[1]) % 8192], c[1] + 1),
        (jnp.zeros((M, 128)), jnp.int32(0)),
    )

    # 4. SoA intersect sweep 230k rays x 2048 tris (chunked 512)
    N = 320 * 240
    orig = jnp.asarray(rng.normal(0, 1, (N, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(0, 1, (N, 3)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (3, 3, 2048)).astype(np.float32))
    def sweep(c):
        acc, k = c
        col = lambda a, i: jax.lax.slice_in_dim(a, i, i+1, axis=1)
        ox, oy, oz = col(orig,0), col(orig,1), col(orig,2)
        dx, dy, dz = col(dirs,0)+k*0.0, col(dirs,1), col(dirs,2)
        def body(carry, ci):
            s = ci * 512
            c0 = jax.lax.dynamic_slice(v[0], (0, s), (3, 512))
            c1 = jax.lax.dynamic_slice(v[1], (0, s), (3, 512))
            c2 = jax.lax.dynamic_slice(v[2], (0, s), (3, 512))
            e1 = [ (c1[i]-c0[i])[None] for i in range(3)]
            e2 = [ (c2[i]-c0[i])[None] for i in range(3)]
            px = dy*e2[2]-dz*e2[1]; py = dz*e2[0]-dx*e2[2]; pz = dx*e2[1]-dy*e2[0]
            det = e1[0]*px+e1[1]*py+e1[2]*pz
            tx = ox-c0[0][None]; ty = oy-c0[1][None]; tz = oz-c0[2][None]
            u = tx*px+ty*py+tz*pz
            qx = ty*e1[2]-tz*e1[1]; qy = tz*e1[0]-tx*e1[2]; qz = tx*e1[1]-ty*e1[0]
            t = e2[0]*qx+e2[1]*qy+e2[2]*qz
            key = jnp.where((det>1e-9)&(u>=0), t, 3e37)
            return jnp.minimum(carry, key.min(1)), None
        out, _ = jax.lax.scan(body, jnp.full((N,), 3e37), jnp.arange(4))
        return (out, k+1)
    device_bench("intersect_230k_x_2048", sweep, (jnp.zeros((N,)), jnp.int32(0)), iters=20)
