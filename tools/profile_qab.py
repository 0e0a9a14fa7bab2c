"""A/B the flat-engine emission/kernel variants on the real chip.

Flags are read at trace time, so one process measures every combination:
block vs quarter emission x unrolled vs bit-iterated sub loop x contig vs
strided quarter DMA.

PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_qab.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


from tracer.accel import flat as F
from tracer.kernels.intersect import Rays
from tracer.render import integrator as I
from tracer.scenes import build_scene, get_scene

desc = get_scene(sys.argv[1] if len(sys.argv) > 1 else "Project: Dragon")
t0 = time.perf_counter()
scene, cfg = build_scene(desc)
log(f"build_scene: {time.perf_counter()-t0:.2f}s")
w, h = cfg.width, cfg.height
n = w * h
u, v = I.pixel_uv(w, h)
R = 10


def make_rays(s, eps):
    jitter = jnp.stack([jnp.full(n, eps), jnp.full(n, eps)], -1)
    r = I.camera_rays(s.camera, u, v, jitter)
    return Rays(r.o, r.d, jnp.full(n, cfg.eta, jnp.float32),
                jnp.full(n, cfg.tmax, jnp.float32))


def bench(name, qemit, kloop, qdma, twophase="0", p1m=48, mxu="0", tries=3):
    os.environ["TRACER_QEMIT"] = qemit
    os.environ["TRACER_KLOOP"] = kloop
    os.environ["TRACER_QDMA"] = qdma
    os.environ["TRACER_MXU"] = mxu
    F.QUARTER_EMIT = qemit != "0"
    F.TWO_PHASE = twophase != "0"
    F.PHASE1_EMITS = p1m

    def stage(s, e):
        return F.closest_hit(make_rays(s, e), s.tb, frame=(w, h))[0]

    def run_k(s, e, k):
        def body(i, acc):
            out = stage(s, e + jnp.float32(i) * 1e-7)
            return acc + jnp.sum(out[::4096])
        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    for attempt in range(tries):
        try:
            f1 = jax.jit(lambda s, e: run_k(s, e, 1))
            fR = jax.jit(lambda s, e: run_k(s, e, R))
            jax.block_until_ready(f1(scene, jnp.float32(0.0)))
            jax.block_until_ready(fR(scene, jnp.float32(0.0)))
            t1s, tRs = [], []
            for i in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f1(scene, jnp.float32(i) * 1e-5))
                t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                jax.block_until_ready(fR(scene, jnp.float32(i) * 1e-5 + 1e-6))
                tRs.append(time.perf_counter() - t0)
            dt = (min(tRs) - min(t1s)) / (R - 1) * 1e3
            log(f"{name:44s} {dt:8.2f} ms")
            return
        except Exception as e:
            log(f"{name}: attempt {attempt} failed: {type(e).__name__}: {e}")
            time.sleep(2)


bench("block 1phase (default)", "0", "bits", "contig", "0")
bench("block 1phase MXU", "0", "bits", "contig", "0", mxu="1")
