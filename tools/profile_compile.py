"""Compile-latency attribution for the cold first frame (VERDICT r4: the
driver recorded 307.97 s cold).

Measures jax lower+compile wall seconds per program piece with the
persistent compile cache DISABLED, so we learn where compile time lives:
tiny jit (tunnel fixed cost), cull-only, kernel-only, full engine, full
step, grad step.

TRACER_JAX_CACHE=/tmp/cold-cache-$$ \
PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_compile.py
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


from tracer.accel import flat as F
from tracer.kernels.intersect import Rays
from tracer.render import integrator as I
from tracer.render import progressive as P
from tracer.scenes import build_scene, get_scene

desc = get_scene(sys.argv[1] if len(sys.argv) > 1 else "Project: Dragon")
scene, cfg = build_scene(desc)
w, h = cfg.width, cfg.height
n = w * h


def compile_time(name, fn, *args):
    t0 = time.perf_counter()
    try:
        lowered = jax.jit(fn).lower(*args)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        flops = compiled.cost_analysis().get("flops", -1)
        log(f"{name:36s} lower {t_lower:6.1f}s  compile {t_compile:7.1f}s"
            f"  (flops {flops:.3g})")
    except Exception as e:
        log(f"{name}: failed {type(e).__name__}: {e}")


u, v = I.pixel_uv(w, h)
jitter = jnp.zeros((n, 2), jnp.float32)


def mkrays(s):
    r = I.camera_rays(s.camera, u, v, jitter)
    return Rays(r.o, r.d, jnp.full(n, cfg.eta, jnp.float32),
                jnp.full(n, cfg.tmax, jnp.float32))


compile_time("tiny (x*2+1)", lambda x: x * 2 + 1, jnp.float32(1.0))
compile_time("raygen", lambda s: mkrays(s).o, scene)
compile_time(
    "engine closest (cull+kernel+sweep)",
    lambda s: F.closest_hit(mkrays(s), s.tb, frame=(w, h))[0],
    scene,
)
compile_time(
    "engine anyhit",
    lambda s: F.any_hit(mkrays(s), s.tb, frame=(w, h)),
    scene,
)
compile_time(
    "trace+shade straight line",
    lambda s: I.render_sample(s, cfg),
    scene,
)
state = P.init_state(cfg)
t0 = time.perf_counter()
lowered = P.step.lower(scene, cfg, state)
t_lower = time.perf_counter() - t0
t0 = time.perf_counter()
lowered.compile()
log(f"{'full progressive step':36s} lower {t_lower:6.1f}s  "
    f"compile {time.perf_counter()-t0:7.1f}s")

from tracer.diff import grad as G

gcfg = dataclasses.replace(cfg, loop="scan", max_depth=2)
target = jnp.zeros((n, 3), jnp.float32)
compile_time(
    "grad step (scan d=2)",
    lambda s: jax.grad(
        lambda ss: jnp.mean((G.render_radiance(ss, gcfg) - target) ** 2),
        allow_int=True,
    )(s),
    scene,
)
