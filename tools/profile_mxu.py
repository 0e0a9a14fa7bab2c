"""Small-K matmul throughput on the MXU: is (128, 16) x (16, N) f32 viable
as the Möller beta/gamma engine, or does K-padding to 128 eat the win?

Reports effective TFLOP/s counting only the K=16 useful flops, for the
shapes the hits kernel would issue, plus a VPU elementwise reference.

PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_mxu.py
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


R = 30


def bench(name, fn, useful_flops, tries=3):
    for attempt in range(tries):
        try:
            def run_k(x, k):
                def body(i, acc):
                    out = fn(x + jnp.float32(i) * 1e-9)
                    return acc + jnp.sum(out[..., ::257])
                return lax.fori_loop(0, k, body, jnp.float32(0.0))

            f1 = jax.jit(lambda x: run_k(x, 1))
            fR = jax.jit(lambda x: run_k(x, R))
            x0 = jnp.float32(0.0)
            jax.block_until_ready(f1(x0))
            jax.block_until_ready(fR(x0))
            t1s, tRs = [], []
            for i in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f1(jnp.float32(i) * 1e-5))
                t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                jax.block_until_ready(fR(jnp.float32(i) * 1e-5 + 1e-7))
                tRs.append(time.perf_counter() - t0)
            dt = (min(tRs) - min(t1s)) / (R - 1)
            log(f"{name:52s} {dt*1e3:8.3f} ms  "
                f"{useful_flops/dt/1e12:6.2f} TF/s effective")
            return
        except Exception as e:
            log(f"{name}: attempt {attempt} failed: {type(e).__name__}: {e}")
            time.sleep(2)


key = jax.random.PRNGKey(0)
B = 512  # batched pairs per launch (~ executed pairs per frame / 10)
A = jax.random.normal(key, (B, 128, 16), jnp.float32)
Bm = jax.random.normal(key, (B, 16, 2048), jnp.float32)
A128 = jax.random.normal(key, (B, 128, 128), jnp.float32)
B128 = jax.random.normal(key, (B, 128, 2048), jnp.float32)

flops16 = 2 * B * 128 * 16 * 2048
flops128 = 2 * B * 128 * 128 * 2048

for prec in ("default", "highest"):
    p = (lax.Precision.HIGHEST if prec == "highest"
         else lax.Precision.DEFAULT)
    bench(
        f"batched (128,16)x(16,2048) f32 {prec}",
        lambda e, p=p: jnp.einsum(
            "bmk,bkn->bmn", A + e, Bm, precision=p),
        flops16,
    )
bench(
    "batched (128,128)x(128,2048) f32 highest",
    lambda e: jnp.einsum(
        "bmk,bkn->bmn", A128 + e, B128, precision=lax.Precision.HIGHEST),
    flops128,
)
bench(
    "batched (128,128)x(128,2048) bf16->f32",
    lambda e: jnp.einsum(
        "bmk,bkn->bmn", (A128 + e).astype(jnp.bfloat16),
        B128.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32),
    flops128,
)
# VPU reference: the ~50-op Möller equivalent on (B, 128, 2048)
C = jax.random.normal(key, (B, 128, 2048), jnp.float32)
bench(
    "VPU 10-op elementwise on (B,128,2048)",
    lambda e: ((C + e) * 1.1 + 0.3) * ((C + e) * 0.9 - 0.2)
    * ((C + e) * 1.05 + 0.1) + (C + e) * 0.5,
    10 * B * 128 * 2048,
)
