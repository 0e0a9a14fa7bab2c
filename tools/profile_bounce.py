"""Isolate bounce-loop/shade overhead. All stages return an (n,) f32 so
output handling is identical; stage costs come from differences."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np
import dataclasses

def log(*a):
    print(*a, file=sys.stderr, flush=True)

from tracer.scenes import build_scene, get_scene
from tracer.render import integrator as I
from tracer.kernels.intersect import Rays

desc = get_scene(sys.argv[1] if len(sys.argv) > 1 else "Project: Dragon")
scene, cfg = build_scene(desc)
w, h = cfg.width, cfg.height
n = w * h
u, v = I.pixel_uv(w, h)


def make_rays(scene, eps):
    jitter = jnp.stack([jnp.full(n, eps), jnp.full(n, eps)], -1)
    rays = I.camera_rays(scene.camera, u, v, jitter)
    return Rays(rays.o, rays.d, jnp.full(n, cfg.eta, jnp.float32),
                jnp.full(n, cfg.tmax, jnp.float32))


def bench(name, fn, reps=20, tries=3):
    for attempt in range(tries):
        try:
            f = jax.jit(fn)
            out = f(scene, jnp.float32(0.0))
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for i in range(1, reps + 1):
                out = f(scene, jnp.float32(i) * 1e-7)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / reps * 1e3
            log(f"{name:48s} {dt:8.2f} ms")
            return out
        except Exception as e:
            log(f"{name}: attempt {attempt} failed: {type(e).__name__}")
            time.sleep(2)
    return None


bench("A raygen", lambda s, e: make_rays(s, e).o[:, 0])

bench("B raygen+engine",
      lambda s, e: __import__("tracer.accel.flat", fromlist=["x"]).closest_hit(
          make_rays(s, e), s.tb, frame=(w, h))[0])

bench("C raygen+trace_closest",
      lambda s, e: I.trace_closest(s, cfg, make_rays(s, e)).t)


def trace_shade(s, e):
    rays = make_rays(s, e)
    hit = I.trace_closest(s, cfg, rays)
    state = jnp.zeros(n, jnp.uint32)
    factor = jnp.ones((n, 3), jnp.float32)
    emit = jnp.ones(n, bool)
    color = I.shade(s, cfg, rays, hit, factor, emit, state)[0]
    return color[:, 0]

bench("D raygen+trace+shade", trace_shade)


def loop_while(s, e):
    rays = make_rays(s, e)
    state = jnp.zeros(n, jnp.uint32)
    return I.bounce_loop(s, cfg, rays, state)[:, 0]

bench("E bounce_loop while d=10 (current)", loop_while)

cfg1 = dataclasses.replace(cfg, max_depth=1)
bench("F bounce_loop while d=1",
      lambda s, e: I.bounce_loop(s, cfg1, make_rays(s, e),
                                 jnp.zeros(n, jnp.uint32))[:, 0])

cfgs1 = dataclasses.replace(cfg, loop="scan", max_depth=1)
bench("G bounce_loop scan d=1",
      lambda s, e: I.bounce_loop(s, cfgs1, make_rays(s, e),
                                 jnp.zeros(n, jnp.uint32))[:, 0])

cfgs2 = dataclasses.replace(cfg, loop="scan", max_depth=2)
bench("H bounce_loop scan d=2",
      lambda s, e: I.bounce_loop(s, cfgs2, make_rays(s, e),
                                 jnp.zeros(n, jnp.uint32))[:, 0])
