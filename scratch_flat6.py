import time
import jax, jax.numpy as jnp
from tracer.accel import flat
from tracer.accel.packet import _dispatch_hits
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
K = flat.K_EMIT

def upto(stage):
    def f(rays):
        o = flat.to_supers(rays.o, W, H, 1.0e30)
        d = flat.to_supers(rays.d, W, H, 1.0)
        tmin = flat.to_supers(rays.tmin, W, H, 1.0)
        tmax = flat.to_supers(rays.tmax, W, H, 0.0)
        if stage == "tile": return o, d, tmin, tmax
        bounds = flat._tile_bounds(o, d, tmin, tmax)
        ok, near = flat._frustum_cull(tb, bounds)
        if stage == "cull": return ok, near
        total = jnp.sum(ok, axis=1, dtype=jnp.int32)
        negnear, ids = jax.lax.top_k(jnp.where(ok, -near, -flat._INF), min(K, tb.blocks.shape[0]))
        if stage == "topk": return negnear, ids, total
        n_tiles = o.shape[0]
        bt0 = tmax
        bp0 = jnp.full((n_tiles, flat.TILE), -1.0, jnp.float32)
        en1 = jnp.minimum(total, min(K, tb.blocks.shape[0]))
        bt, bp = _dispatch_hits(tb, ids, -negnear, en1, o, d, tmin, bt0, bp0, False)
        return bt, bp
    return jax.jit(f)

for stage in ("tile", "cull", "topk", "hits"):
    dt, _ = timeit(upto(stage), rays)
    print(f"up to {stage}: {dt*1e3:.2f} ms")

dt, _ = timeit(jax.jit(lambda r: flat.closest_hit(r, tb, frame=(W, H))), rays)
print(f"full closest_hit: {dt*1e3:.2f} ms")
