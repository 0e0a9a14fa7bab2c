import time
import jax, jax.numpy as jnp, numpy as np
from tracer.accel import flat
from tracer.kernels.intersect import Rays
from tracer.render.camera import camera_rays, pixel_uv
from tracer.scenes import build_scene, get_scene

def timeit(fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out

desc = get_scene("Project: Dragon")
scene, cfg = build_scene(desc)
tb = scene.tb
W, H = cfg.width, cfg.height
u, v = pixel_uv(W, H)
r0 = camera_rays(scene.camera, u, v)
rays = Rays(r0.o, r0.d, jnp.full((W*H,), 1e-3), jnp.full((W*H,), 5000.0))

o = flat.to_supers(rays.o, W, H, 1.0e30)
d = flat.to_supers(rays.d, W, H, 1.0)
tmin = flat.to_supers(rays.tmin, W, H, 1.0)
tmax = flat.to_supers(rays.tmax, W, H, 0.0)
n_super = o.shape[0]

def phase_a(o, d, tmin, tmax):
    sb = flat.sub_bounds(o, d, tmin, tmax)
    super_bounds = (
        jnp.min(sb[:, :, 0:3], axis=1), jnp.max(sb[:, :, 3:6], axis=1),
        jnp.min(sb[:, :, 6:9], axis=1), jnp.max(sb[:, :, 9:12], axis=1),
        jnp.min(jnp.where(sb[:, :, 13] > 0.5, sb[:, :, 12], flat._BIG), axis=1),
        jnp.max(jnp.where(tmax > tmin, tmax, -flat._BIG), axis=1),
        jnp.any(sb[:, :, 13] > 0.5, axis=1),
    )
    ok, near = flat._frustum_cull(tb, super_bounds)
    total = jnp.sum(ok, axis=1, dtype=jnp.int32)
    negnear, ids = jax.lax.top_k(jnp.where(ok, -near, -flat._INF), min(flat.K_EMIT, tb.blocks.shape[0]))
    return sb, ids, -negnear, jnp.minimum(total, flat.K_EMIT)

pa = jax.jit(phase_a)
dt, (sb, ids, enear, en) = timeit(pa, o, d, tmin, tmax)
print(f"phase A (bounds+cull+topk): {dt*1e3:.2f} ms; en mean {float(jnp.mean(en)):.0f}")

from tracer.kernels.super_hits import hits2
bt0 = tmax; bp0 = jnp.full((n_super, flat.SUPER), -1.0)
kern = jax.jit(lambda ids, enear, en, sb, bt, bp: hits2(tb, ids, enear, en, sb, o, d, tmin, bt, bp, False))
dt, (bt, bp) = timeit(kern, ids, enear, en, sb, bt0, bp0)
print(f"closest kernel: {dt*1e3:.2f} ms")

# shadow
t_full, pid = jax.jit(lambda r: flat.closest_hit(r, tb, frame=(W,H)))(rays)
hitm = pid >= 0
pos = rays.o + t_full[:, None] * rays.d
ld = -jnp.asarray(cfg.dir_light_direction, jnp.float32); ld = ld/jnp.linalg.norm(ld)
so = flat.to_supers(pos + 1e-3*ld[None,:], W, H, 1.0e30)
sdd = flat.to_supers(jnp.broadcast_to(ld, pos.shape), W, H, 1.0)
stmin = flat.to_supers(jnp.full((W*H,), 1e-3), W, H, 1.0)
stmax = flat.to_supers(jnp.where(hitm, 5000.0, 0.0), W, H, 0.0)
dt, (ssb, sids, senear, sen) = timeit(pa, so, sdd, stmin, stmax)
print(f"shadow phase A: {dt*1e3:.2f} ms; en mean {float(jnp.mean(sen)):.0f}")
skern = jax.jit(lambda ids, enear, en, sb, bt, bp: hits2(tb, ids, enear, en, sb, so, sdd, stmin, bt, bp, True))
dt, _ = timeit(skern, sids, senear, sen, ssb, stmax, jnp.full((n_super, flat.SUPER), -1.0))
print(f"shadow kernel: {dt*1e3:.2f} ms")

# fixed overhead: all gates false (alive=0)
sb_dead = sb.at[:, :, 13].set(0.0)
dt, _ = timeit(kern, ids, enear, en, sb_dead, bt0, bp0)
print(f"closest kernel, gates off (DMA+pretest only): {dt*1e3:.2f} ms")
# no break also (enear=0 disables nothing for closest since ub>0... it's already measured with break)
