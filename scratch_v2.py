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

f = jax.jit(lambda r: flat.closest_hit(r, tb, frame=(W, H)))
dt, (t, pid) = timeit(f, rays)
print(f"v2 closest_hit: {dt*1e3:.2f} ms ({W*H/dt/1e6:.1f} Mray/s)")
print(f"hit fraction: {float(jnp.mean((pid >= 0))):.3f}")

# emission stats
o = flat.to_supers(rays.o, W, H, 1.0e30)
d = flat.to_supers(rays.d, W, H, 1.0)
tmin = flat.to_supers(rays.tmin, W, H, 1.0)
tmax = flat.to_supers(rays.tmax, W, H, 0.0)
n_super = o.shape[0]
sb = flat.sub_bounds(o, d, tmin, tmax)
super_bounds = (
    jnp.min(sb[:, :, 0:3], axis=1), jnp.max(sb[:, :, 3:6], axis=1),
    jnp.min(sb[:, :, 6:9], axis=1), jnp.max(sb[:, :, 9:12], axis=1),
    jnp.min(jnp.where(sb[:, :, 13] > 0.5, sb[:, :, 12], flat._BIG), axis=1),
    jnp.max(jnp.where(tmax > tmin, tmax, -flat._BIG), axis=1),
    jnp.any(sb[:, :, 13] > 0.5, axis=1),
)
ok, near = flat._frustum_cull(tb, super_bounds)
en = np.asarray(jnp.sum(ok, axis=1))
print(f"n_super {n_super}; emissions/super: mean {en.mean():.1f} max {en.max()}")

hitm = pid >= 0
pos = rays.o + t[:, None] * rays.d
ld = -jnp.asarray(cfg.dir_light_direction, jnp.float32)
ld = ld / jnp.linalg.norm(ld)
srays = Rays(pos + 1e-3 * ld[None, :], jnp.broadcast_to(ld, pos.shape),
             jnp.full((W*H,), 1e-3), jnp.where(hitm, 5000.0, 0.0))
g = jax.jit(lambda r: flat.any_hit(r, tb, frame=(W, H)))
dt, occ = timeit(g, srays)
print(f"v2 shadow any_hit: {dt*1e3:.2f} ms; occluded {float(jnp.mean(occ)):.3f}")
