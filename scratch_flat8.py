import time
import jax, jax.numpy as jnp
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
o = flat.to_tiles(rays.o, W, H, 1.0e30)
d = flat.to_tiles(rays.d, W, H, 1.0)
tmin = flat.to_tiles(rays.tmin, W, H, 1.0)
tmax = flat.to_tiles(rays.tmax, W, H, 0.0)
ok, near = jax.jit(lambda: flat._frustum_cull(tb, flat._tile_bounds(o, d, tmin, tmax)))()
ok, near = jax.block_until_ready((ok, near))
NT = near.shape[1]
tid = jax.lax.broadcasted_iota(jnp.int32, near.shape, 1)

def packed(ok, near):
    nb = jax.lax.bitcast_convert_type(near, jnp.int32)
    key = jnp.where(ok, (nb & ~jnp.int32(0x3FFF)) | tid,
                    jnp.int32(0x7F000000) + tid)
    kf = jax.lax.bitcast_convert_type(key, jnp.float32)
    vals, ids = jax.lax.top_k(-kf, 1024)
    return vals, ids
dt, _ = timeit(jax.jit(packed), ok, near)
print(f"top_k packed-unique: {dt*1e3:.2f} ms")

# is it the -INF fill? use a large finite fill instead
def fill_test(ok, near):
    return jax.lax.top_k(jnp.where(ok, -near, -1e9), 1024)
dt, _ = timeit(jax.jit(fill_test), ok, near)
print(f"top_k fill=-1e9: {dt*1e3:.2f} ms")

def fill_test2(ok, near):
    return jax.lax.top_k(jnp.where(ok, -near, -3e38), 1024)
dt, _ = timeit(jax.jit(fill_test2), ok, near)
print(f"top_k fill=-3e38: {dt*1e3:.2f} ms")
