"""Pure device-time stage profiler (results forced with float() readback:
block_until_ready does NOT reliably block on the tunneled backend): each stage runs R times inside one jit
via fori_loop (input varied by loop index, output scalar-reduced), so the
per-launch tunnel overhead of the axon backend is paid once per STAGE, not
once per rep. Reported ms = (t_launch(R) - t_launch(1)) / (R - 1): genuine
on-device time per iteration."""
import sys, time
import jax, jax.numpy as jnp
from jax import lax
import numpy as np
import dataclasses

def log(*a):
    print(*a, file=sys.stderr, flush=True)

from tracer.scenes import build_scene, get_scene
from tracer.render import integrator as I
from tracer.kernels.intersect import Rays
from tracer.accel import flat as F

desc = get_scene(sys.argv[1] if len(sys.argv) > 1 else "Project: Dragon")
t0 = time.perf_counter()
scene, cfg = build_scene(desc)
log(f"build_scene: {time.perf_counter()-t0:.2f}s")
w, h = cfg.width, cfg.height
n = w * h
u, v = I.pixel_uv(w, h)
R = 10


def make_rays(scene, eps):
    jitter = jnp.stack([jnp.full(n, eps), jnp.full(n, eps)], -1)
    rays = I.camera_rays(scene.camera, u, v, jitter)
    return Rays(rays.o, rays.d, jnp.full(n, cfg.eta, jnp.float32),
                jnp.full(n, cfg.tmax, jnp.float32))


def bench(name, stage, tries=3):
    """stage(scene, eps) -> array; reduced to a scalar and accumulated."""
    def run_k(s, e, k):
        def body(i, acc):
            out = stage(s, e + jnp.float32(i) * 1e-7)
            return acc + jnp.sum(out[:: max(1, out.shape[0] // 64)])
        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    for attempt in range(tries):
        try:
            f1 = jax.jit(lambda s, e: run_k(s, e, 1))
            fR = jax.jit(lambda s, e: run_k(s, e, R))
            float(f1(scene, jnp.float32(0.0)))
            float(fR(scene, jnp.float32(0.0)))
            t1s = []
            tRs = []
            for i in range(3):
                t0 = time.perf_counter()
                float(f1(scene, jnp.float32(i) * 1e-5))
                t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(fR(scene, jnp.float32(i) * 1e-5 + 1e-6))
                tRs.append(time.perf_counter() - t0)
            dt = (min(tRs) - min(t1s)) / (R - 1) * 1e3
            log(f"{name:44s} {dt:8.2f} ms  (launch+1x: {min(t1s)*1e3:.1f})")
            return
        except Exception as e:
            log(f"{name}: attempt {attempt} failed: {type(e).__name__}: {e}")
            time.sleep(2)


bench("raygen", lambda s, e: make_rays(s, e).o[:, 0])
bench("raygen+engine",
      lambda s, e: F.closest_hit(make_rays(s, e), s.tb, frame=(w, h))[0])
bench("raygen+trace_closest",
      lambda s, e: I.trace_closest(s, cfg, make_rays(s, e)).t)


def trace_shade(s, e):
    rays = make_rays(s, e)
    hit = I.trace_closest(s, cfg, rays)
    state = jnp.zeros(n, jnp.uint32)
    factor = jnp.ones((n, 3), jnp.float32)
    emit = jnp.ones(n, bool)
    color = I.shade(s, cfg, rays, hit, factor, emit, state)[0]
    return color[:, 0]

bench("raygen+trace+shade", trace_shade)

bench("bounce while d=10 (current)",
      lambda s, e: I.bounce_loop(s, cfg, make_rays(s, e),
                                 jnp.zeros(n, jnp.uint32))[:, 0])

cfg1 = dataclasses.replace(cfg, max_depth=1)
bench("bounce while d=1",
      lambda s, e: I.bounce_loop(s, cfg1, make_rays(s, e),
                                 jnp.zeros(n, jnp.uint32))[:, 0])

cfgs1 = dataclasses.replace(cfg, loop="scan", max_depth=1)
bench("bounce scan d=1",
      lambda s, e: I.bounce_loop(s, cfgs1, make_rays(s, e),
                                 jnp.zeros(n, jnp.uint32))[:, 0])

cfgs2 = dataclasses.replace(cfg, loop="scan", max_depth=2)
bench("bounce scan d=2",
      lambda s, e: I.bounce_loop(s, cfgs2, make_rays(s, e),
                                 jnp.zeros(n, jnp.uint32))[:, 0])
