"""Hit-attribute gather microbench: the (N, 20) tri_table row gather costs
~3.2 ms/frame (~9 GB/s effective). Candidates: 32-col padded rows (lane-
aligned 128 B), 8-col narrow table, split gathers, gather-from-sorted.

PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_gather.py
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


from tracer.accel import flat as F
from tracer.kernels.intersect import Rays
from tracer.render import integrator as I
from tracer.scenes import build_scene, get_scene

desc = get_scene("Project: Dragon")
scene, cfg = build_scene(desc)
w, h = cfg.width, cfg.height
n = w * h
u, v = I.pixel_uv(w, h)
jitter = jnp.zeros((n, 2), jnp.float32)
cam_rays = I.camera_rays(scene.camera, u, v, jitter)
rays = Rays(cam_rays.o, cam_rays.d, jnp.full(n, cfg.eta, jnp.float32),
            jnp.full(n, cfg.tmax, jnp.float32))
t_true, pid = F.closest_hit(rays, tb := scene.tb, frame=(w, h))
pid = jnp.clip(pid.astype(jnp.int32), 0, scene.geom.indices.shape[0] - 1)
jax.block_until_ready(pid)
T = scene.geom.tri_table.shape[0]
R = 20


def bench(name, fn, bytes_moved, tries=3):
    def run_k(p, k):
        def body(i, acc):
            out = fn((p + i) % T)
            return acc + jnp.sum(out[::4096])
        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    for attempt in range(tries):
        try:
            f1 = jax.jit(lambda p: run_k(p, 1))
            fR = jax.jit(lambda p: run_k(p, R))
            jax.block_until_ready(f1(pid))
            jax.block_until_ready(fR(pid))
            t1s, tRs = [], []
            for i in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f1((pid + i) % T))
                t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                jax.block_until_ready(fR((pid + i + 7) % T))
                tRs.append(time.perf_counter() - t0)
            dt = (min(tRs) - min(t1s)) / (R - 1)
            log(f"{name:40s} {dt*1e3:8.3f} ms  "
                f"{bytes_moved/dt/1e9:7.1f} GB/s")
            return
        except Exception as e:
            log(f"{name}: attempt {attempt} failed: {type(e).__name__}: {e}")
            time.sleep(2)


tt20 = scene.geom.tri_table  # (T, 20)
tt32 = jnp.pad(tt20, ((0, 0), (0, 12)))
tt16 = tt20[:, :16]
tt8 = tt20[:, :8]
jax.block_until_ready(tt32)

bench("(N,20) row gather (current)", lambda p: tt20[p].sum(axis=1),
      n * 20 * 4)
bench("(N,32) padded row gather", lambda p: tt32[p].sum(axis=1), n * 32 * 4)
bench("(N,16) row gather", lambda p: tt16[p].sum(axis=1), n * 16 * 4)
bench("(N,8) row gather", lambda p: tt8[p].sum(axis=1), n * 8 * 4)
bench("(N,) 1-col gather", lambda p: tt20[p, 0], n * 4)
# sorted indices: is the cost random-access or per-row overhead?
psort = jnp.sort(pid)
bench("(N,20) row gather, sorted idx", lambda p: tt20[psort + 0 * p].sum(axis=1),
      n * 20 * 4)
# take_along_axis formulation
bench("(N,20) via take", lambda p: jnp.take(tt20, p, axis=0).sum(axis=1),
      n * 20 * 4)
