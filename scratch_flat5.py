import time
import jax, jax.numpy as jnp, numpy as np

def timeit(fn, argsets, n=10):
    out = fn(*argsets[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n): out = fn(*argsets[i % len(argsets)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out

NTILES, NT = 2850, 11484
keys = jax.random.split(jax.random.PRNGKey(1), 10)
nears = [jax.random.uniform(k, (NTILES, NT), jnp.float32) for k in keys]
oks = [x < 0.0015 for x in nears]
nearms = [jnp.where(o, x, 3e38) for o, x in zip(oks, nears)]

for K in (512, 1024):
    f = jax.jit(lambda x, K=K: jax.lax.top_k(-x, K))
    dt, _ = timeit(f, [(x,) for x in nearms])
    print(f"top_k f32 {K}: {dt*1e3:.2f} ms")

tid = jax.lax.broadcasted_iota(jnp.int32, (NTILES, NT), 1)
g = jax.jit(lambda ok: jax.lax.top_k(jnp.where(ok, tid, -1), 512))
dt, _ = timeit(g, [(o,) for o in oks])
print(f"top_k int tid 512: {dt*1e3:.2f} ms")

smalls = [jax.random.uniform(k, (NTILES, 512)) for k in keys]
sid = jnp.broadcast_to(jnp.arange(512, dtype=jnp.int32), (NTILES, 512))
h = jax.jit(lambda x: jax.lax.sort((x, sid), dimension=1, num_keys=1))
dt, _ = timeit(h, [(x,) for x in smalls])
print(f"small sort (2850,512): {dt*1e3:.2f} ms")

idxs = [jax.random.randint(k, (NTILES, 512), 0, NT) for k in keys]
ga = jax.jit(lambda near, idx: jnp.take_along_axis(near, idx, axis=1))
dt, _ = timeit(ga, list(zip(nears, idxs)))
print(f"take_along_axis (2850,512): {dt*1e3:.2f} ms")
