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
negnear = jax.block_until_ready(jnp.where(ok, -near, -flat._INF))

f = jax.jit(lambda x: jax.lax.top_k(x, 1024))
dt, _ = timeit(f, negnear)
print(f"top_k 1024 on real cull data: {dt*1e3:.2f} ms")
g = jax.jit(lambda x: jax.lax.top_k(x, 128))
dt, _ = timeit(g, negnear)
print(f"top_k 128 on real cull data: {dt*1e3:.2f} ms")
# barrier variant inside one jit
def h(ok, near):
    x = jax.lax.optimization_barrier(jnp.where(ok, -near, -flat._INF))
    return jax.lax.top_k(x, 1024)
dt, _ = timeit(jax.jit(h), ok, near)
print(f"where+topk with barrier: {dt*1e3:.2f} ms")
def h2(ok, near):
    return jax.lax.top_k(jnp.where(ok, -near, -flat._INF), 1024)
dt, _ = timeit(jax.jit(h2), ok, near)
print(f"where+topk fused: {dt*1e3:.2f} ms")
