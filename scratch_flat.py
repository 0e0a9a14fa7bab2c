"""Measure primitive costs for a flat-dense frustum phase A on TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np

N_TILES = 2850
NT = 11484
K = 128


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


key = jax.random.PRNGKey(0)
boxes_lo = jax.random.uniform(key, (NT, 3))
boxes_hi = boxes_lo + 0.1
o_lo = jax.random.uniform(key, (N_TILES, 3))
o_hi = o_lo + 0.01
inv_lo = jax.random.uniform(key, (N_TILES, 3)) - 0.5
inv_hi = inv_lo + 0.2
tmax = jnp.full((N_TILES,), 10.0)


@jax.jit
def frustum_test(boxes_lo, boxes_hi, o_lo, o_hi, inv_lo, inv_hi, tmax):
    # interval slab: a = (lo - o) in [lo - o_hi, lo - o_lo]
    a_lo = boxes_lo[None, :, :] - o_hi[:, None, :]
    a_hi = boxes_lo[None, :, :] - o_lo[:, None, :]
    b_lo = boxes_hi[None, :, :] - o_hi[:, None, :]
    b_hi = boxes_hi[None, :, :] - o_lo[:, None, :]

    def imul(x_lo, x_hi, y_lo, y_hi):
        p1 = x_lo * y_lo
        p2 = x_lo * y_hi
        p3 = x_hi * y_lo
        p4 = x_hi * y_hi
        return (
            jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
            jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)),
        )

    il = inv_lo[:, None, :]
    ih = inv_hi[:, None, :]
    t0_lo, t0_hi = imul(a_lo, a_hi, il, ih)
    t1_lo, t1_hi = imul(b_lo, b_hi, il, ih)
    near_lo = jnp.minimum(t0_lo, t1_lo)
    far_hi = jnp.maximum(t0_hi, t1_hi)
    near = jnp.max(near_lo, axis=-1)
    far = jnp.min(far_hi, axis=-1)
    ok = (near <= far) & (far >= 0.0) & (near < tmax[:, None])
    nearc = jnp.where(ok, jnp.maximum(near, 0.0), 3e38)
    return ok, nearc


def topk(near):
    v, idx = jax.lax.top_k(-near, K)
    return v, idx


topk = jax.jit(topk)

ok, near = frustum_test(boxes_lo, boxes_hi, o_lo, o_hi, inv_lo, inv_hi, tmax)
dt = timeit(frustum_test, boxes_lo, boxes_hi, o_lo, o_hi, inv_lo, inv_hi, tmax)
print(f"dense frustum test ({N_TILES}x{NT}): {dt*1e3:.2f} ms")

dt = timeit(topk, near)
print(f"top_k K={K} on ({N_TILES},{NT}): {dt*1e3:.2f} ms")


# sort-based alternative
@jax.jit
def sort2(near):
    tid = jnp.broadcast_to(jnp.arange(NT, dtype=jnp.int32), near.shape)
    sn, st = jax.lax.sort((near, tid), dimension=1, num_keys=1)
    return sn[:, :K], st[:, :K]


dt = timeit(sort2, near)
print(f"full sort on ({N_TILES},{NT}): {dt*1e3:.2f} ms")


# searchsorted-style compaction (id order, no near order)
@jax.jit
def compact(ok):
    cs = jnp.cumsum(ok.astype(jnp.int32), axis=1)  # inclusive
    kk = jnp.arange(1, K + 1, dtype=jnp.int32)
    idx = jax.vmap(lambda row: jnp.searchsorted(row, kk))(cs)
    en = cs[:, -1]
    return idx, en


dt = timeit(compact, ok)
print(f"cumsum+searchsorted compaction: {dt*1e3:.2f} ms")
print("mean emissions:", float(jnp.mean(jnp.sum(ok, axis=1))))
