"""On-chip A/B of the (V, 6) vertex scatter-add formulations.

Stages, each timed by a device-resident fori loop whose input varies with
the loop index (PROFILE finding 14):
  add      — plain scatter-add (the ~85 ns/index XLA lowering)
  sort     — lax.sort 7-operand (cost of the sort alone)
  place    — Pallas one-hot MXU placement on pre-sorted data
  pallas   — sort + place end-to-end (the TRACER_SCATTER=pallas path)

PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_scatter.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


V = 437_645
M = 1_080_000
REPS = 20

rng = np.random.default_rng(0)
ids0 = jnp.asarray(rng.integers(0, V, size=(M,)).astype(np.int32))
g0 = jnp.asarray(rng.normal(size=(M, 6)).astype(np.float32))

from tracer.kernels.scatter_vn import scatter_add_vn_pallas, segment_place

sorted_ops = jax.lax.sort([ids0] + [g0[:, j] for j in range(6)], num_keys=1)
sids0 = sorted_ops[0]
svals0 = jnp.stack(sorted_ops[1:], axis=-1)


def make(fn, *inputs):
    def run(k, seed, *ins):
        def body(i, acc):
            shifted = [
                x if x.dtype == jnp.int32
                else x + (seed + i).astype(x.dtype) * jnp.asarray(1e-7, x.dtype)
                for x in ins
            ]
            out = fn(*shifted)
            return acc + out.reshape(-1)[::8191].sum()

        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    # seed varies per CALL as well as per iteration (the tunnel memoizes
    # identical-input launches), and the result is read back with float()
    # — block_until_ready does NOT block on this backend (finding 14 bis).
    f1 = jax.jit(lambda seed, *ins: run(1, seed, *ins))
    fR = jax.jit(lambda seed, *ins: run(REPS, seed, *ins))
    s = iter(range(1, 100))
    float(f1(jnp.float32(next(s)), *inputs))
    float(fR(jnp.float32(next(s)), *inputs))
    best = 1e9
    for _ in range(3):
        a, b = jnp.float32(next(s)), jnp.float32(next(s))
        t0 = time.perf_counter()
        float(f1(a, *inputs))
        t1 = time.perf_counter()
        float(fR(b, *inputs))
        t2 = time.perf_counter()
        log(f"    raw single {1e3*(t1-t0):7.2f} ms   {REPS}x {1e3*(t2-t1):8.2f} ms")
        best = min(best, ((t2 - t1) - (t1 - t0)) / (REPS - 1))
    return best


def stage(name, fn, *inputs):
    try:
        dt = make(fn, *inputs)
        log(f"{name:28s} {dt*1e3:8.2f} ms")
    except Exception as e:
        log(f"{name}: failed {type(e).__name__}: {e}")


stage("scatter add", lambda ids, g: jnp.zeros((V, 6), jnp.float32).at[ids].add(g), ids0, g0)
stage(
    "lax.sort 7-op",
    lambda ids, g: jax.lax.sort([ids] + [g[:, j] for j in range(6)], num_keys=1)[1],
    ids0, g0,
)
stage("pallas place (pre-sorted)", lambda s, v: segment_place(s, v, V), sids0, svals0)
stage("sort + place e2e", lambda ids, g: scatter_add_vn_pallas(ids, g, V), ids0, g0)
stage(
    "sorted segment_sum",
    lambda s, v: jax.ops.segment_sum(v, s, num_segments=V, indices_are_sorted=True),
    sids0, svals0,
)
