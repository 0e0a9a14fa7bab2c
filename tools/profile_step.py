"""Profile full step components (dev scratch)."""
import sys, time
import jax, jax.numpy as jnp

def log(*a):
    print(*a, file=sys.stderr, flush=True)

from tracer.scenes import build_scene, get_scene
from tracer.render import progressive as P
from tracer.render import integrator as I
from tracer.kernels.intersect import Rays

desc = get_scene("Project: Dragon")
scene, cfg = build_scene(desc)
log(f"selection1={scene.uniforms.selection1}, loop={cfg.loop}, max_depth={cfg.max_depth}, subdivs={cfg.subdivs}, shadows={cfg.shadows}")

w, h = cfg.width, cfg.height
u, v = I.pixel_uv(w, h)
n = w * h
rays = I.camera_rays(scene.camera, u, v, jnp.zeros((n, 2), jnp.float32))
rays = Rays(rays.o, rays.d, jnp.full(n, cfg.eta, jnp.float32), jnp.full(n, cfg.tmax, jnp.float32))

tc = jax.jit(lambda s, r: I.trace_closest(s, cfg, r), static_argnames=())
hit = tc(scene, rays); jax.block_until_ready(hit.t)
t0 = time.perf_counter()
hit = tc(scene, rays); jax.block_until_ready(hit.t)
log(f"trace_closest full frame: {(time.perf_counter()-t0)*1e3:.1f}ms")
import numpy as np
log(f"hit fraction: {np.mean(np.asarray(hit.valid)):.3f}")

rs = jax.jit(lambda s: I.render_sample(s, cfg))
r = rs(scene); jax.block_until_ready(r)
t0 = time.perf_counter()
r = rs(scene); jax.block_until_ready(r)
log(f"render_sample: {(time.perf_counter()-t0)*1e3:.1f}ms")

state = P.init_state(cfg)
t0 = time.perf_counter()
state = P.step(scene, cfg, state); jax.block_until_ready(state.accum)
log(f"step first (compile): {time.perf_counter()-t0:.2f}s")
for k in range(3):
    t0 = time.perf_counter()
    state = P.step(scene, cfg, state); jax.block_until_ready(state.accum)
    log(f"step: {(time.perf_counter()-t0)*1e3:.1f}ms")
