import time
import jax, jax.numpy as jnp

def timeit(fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out

key = jax.random.PRNGKey(0)
NTRI, N = 870_000, 360_000
table24 = jax.random.uniform(key, (NTRI, 24))
table3 = jax.random.uniform(key, (NTRI, 3))
idx = jax.random.randint(key, (N,), 0, NTRI)

f = jax.jit(lambda t, i: t[i])
dt, _ = timeit(f, table24, idx)
print(f"row gather (360k, 24): {dt*1e3:.2f} ms")
dt, _ = timeit(f, table3, idx)
print(f"row gather (360k, 3): {dt*1e3:.2f} ms")
g = jax.jit(lambda t, i: t[i])
idx_sorted = jnp.sort(idx)
dt, _ = timeit(g, table3, idx_sorted)
print(f"row gather sorted idx (360k, 3): {dt*1e3:.2f} ms")
# one-hot matmul alternative for small tables
mats = jax.random.uniform(key, (8, 3))
midx = jax.random.randint(key, (N,), 0, 8)
h = jax.jit(lambda m, i: jax.nn.one_hot(i, 8) @ m)
dt, _ = timeit(h, mats, midx)
print(f"one-hot matmul (360k, 8->3): {dt*1e3:.2f} ms")
