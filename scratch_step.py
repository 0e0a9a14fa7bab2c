import time
import jax, jax.numpy as jnp
from tracer.render import integrator as I
from tracer.render import progressive as P
from tracer.render.camera import camera_rays, pixel_uv
from tracer.kernels.intersect import Rays
from tracer.accel import flat
from tracer.scenes import build_scene, get_scene

def timeit(fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out

desc = get_scene("Project: Dragon")
scene, cfg = build_scene(desc)
W, H = cfg.width, cfg.height
u, v = pixel_uv(W, H)
r0 = camera_rays(scene.camera, u, v)
n = W * H
rays = Rays(r0.o, r0.d, jnp.full(n, cfg.eta), jnp.full(n, cfg.tmax))

dt, _ = timeit(jax.jit(lambda r: flat.closest_hit(r, scene.tb, frame=(W,H))), rays)
print(f"flat.closest_hit:  {dt*1e3:.2f} ms")
dt, hit = timeit(jax.jit(lambda r: I.trace_closest(scene, cfg, r)), rays)
print(f"trace_closest:     {dt*1e3:.2f} ms")
dt, _ = timeit(jax.jit(lambda r: I.trace_occluded(scene, cfg, r)), rays)
print(f"trace_occluded:    {dt*1e3:.2f} ms")
from tracer.math import rng as RNG
state = RNG.pixel_seed(jnp.arange(n, dtype=jnp.uint32), scene.uniforms.iteration)
dt, _ = timeit(jax.jit(lambda r, h: I.shade(scene, cfg, r, h, jnp.ones((n,3)), jnp.ones(n,bool), state)), rays, hit)
print(f"shade (incl shadow): {dt*1e3:.2f} ms")
dt, _ = timeit(jax.jit(lambda r: I.bounce_loop(scene, cfg, r, state)), rays)
print(f"bounce_loop:       {dt*1e3:.2f} ms")
st = P.init_state(cfg)
dt, st2 = timeit(lambda s: P.step(scene, cfg, s), st)
print(f"P.step:            {dt*1e3:.2f} ms")
