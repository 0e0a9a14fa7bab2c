"""Piecewise frame profiler: where does the dragon 800x450 frame go?

Every stage is a single jitted function taking (scene, eps) and generating
its rays *inside* the jit (an eager make_rays per rep costs ms of tunnel
dispatch and poisons the numbers). eps varies per rep so the runtime tunnel
cannot memoize identical launches (PROFILE.md finding 8).
"""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

def log(*a):
    print(*a, file=sys.stderr, flush=True)

from tracer.scenes import build_scene, get_scene
from tracer.render import integrator as I
from tracer.render import progressive as P
from tracer.kernels.intersect import Rays
from tracer.accel import flat as F

desc = get_scene(sys.argv[1] if len(sys.argv) > 1 else "Project: Dragon")
t0 = time.perf_counter()
scene, cfg = build_scene(desc)
log(f"build: {time.perf_counter()-t0:.2f}s  cfg: loop={cfg.loop} mode={cfg.mode} shadows={cfg.shadows}")

w, h = cfg.width, cfg.height
n = w * h
u, v = I.pixel_uv(w, h)


def make_rays(scene, eps):
    jitter = jnp.stack([jnp.full(n, eps), jnp.full(n, eps)], -1)
    rays = I.camera_rays(scene.camera, u, v, jitter)
    return Rays(rays.o, rays.d, jnp.full(n, cfg.eta, jnp.float32),
                jnp.full(n, cfg.tmax, jnp.float32))


def bench(name, fn, reps=10):
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


bench("raygen", lambda s, e: make_rays(s, e).o)


def prep(s, e, K):
    from functools import partial
    r = make_rays(s, e)
    tb = s.tb
    tile = partial(F.to_supers, W=w, H=h)
    o = tile(r.o, fill=1.0e30)
    d = tile(r.d, fill=1.0)
    tmin = tile(r.tmin, fill=1.0)
    tmax = tile(r.tmax, fill=0.0)
    n_super = o.shape[0]
    sb = F.sub_bounds(o, d, tmin, tmax)
    super_bounds = (
        jnp.min(sb[:, :, 0:3], axis=1), jnp.max(sb[:, :, 3:6], axis=1),
        jnp.min(sb[:, :, 6:9], axis=1), jnp.max(sb[:, :, 9:12], axis=1),
        jnp.min(jnp.where(sb[:, :, 13] > 0.5, sb[:, :, 12], F._BIG), axis=1),
        jnp.max(jnp.where(tmax.reshape(n_super, -1) > tmin.reshape(n_super, -1),
                          tmax.reshape(n_super, -1), -F._BIG), axis=1),
        jnp.any(sb[:, :, 13] > 0.5, axis=1),
    )
    ok, near = F._frustum_cull(tb, super_bounds)
    NT = tb.blocks.shape[0]
    K = min(K, NT)
    total = jnp.sum(ok, axis=1, dtype=jnp.int32)
    negnear, ids = jax.lax.top_k(jnp.where(ok, -near, -F._INF), K)
    return total, ids, -negnear

out = bench("raygen+prep K=NT (current)", lambda s, e: prep(s, e, 1 << 30))
tt = np.asarray(out[0])
log(f"  emissions/super: mean={tt.mean():.1f} max={tt.max()} n_super={tt.shape[0]} NT={scene.tb.blocks.shape[0]}")
bench("raygen+prep K=128", lambda s, e: prep(s, e, 128))
bench("raygen+prep K=64", lambda s, e: prep(s, e, 64))

bench("raygen+closest_hit (full engine)",
      lambda s, e: F.closest_hit(make_rays(s, e), s.tb, frame=(w, h)))
bench("raygen+trace_closest (engine+attrs)",
      lambda s, e: I.trace_closest(s, cfg, make_rays(s, e)).t)


def sample(s, e):
    s = P.replace(s, uniforms=P.replace(
        s.uniforms, iteration=(e * 1e9).astype(jnp.uint32)))
    return I.render_sample(s, cfg)

bench("render_sample (full frame)", sample)

state = P.init_state(cfg)
state = jax.block_until_ready(P.step(scene, cfg, state))
t0 = time.perf_counter()
reps = 10
for i in range(reps):
    state = P.step(scene, cfg, state)
jax.block_until_ready(state.accum)
log(f"{'P.step (donated accumulate)':48s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")
