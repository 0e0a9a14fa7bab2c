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
o = flat.to_tiles(r0.o, W, H, 1.0e30)
d = flat.to_tiles(r0.d, W, H, 1.0)
tmin = flat.to_tiles(jnp.full((W*H,), 1e-3), W, H, 1.0)
tmax = flat.to_tiles(jnp.full((W*H,), 5000.0), W, H, 0.0)

cull = jax.jit(lambda: flat._frustum_cull(tb, flat._tile_bounds(o, d, tmin, tmax)))
dt, (ok, near) = timeit(cull)
print(f"cull: {dt*1e3:.2f} ms")

tid0 = jax.lax.broadcasted_iota(jnp.int32, ok.shape, 1)
srt = jax.jit(lambda ok, near: jax.lax.sort((jnp.where(ok, near, 3e38), tid0), dimension=1, num_keys=1))
dt, (sn, si) = timeit(srt, ok, near)
print(f"sort: {dt*1e3:.2f} ms")

from tracer.kernels import treelet_hits as tk
total = jnp.sum(ok, axis=1, dtype=jnp.int32)
K = 512
ids = si[:, :K]; enear = sn[:, :K]
en = jnp.clip(total, 0, K)
bt0 = tmax; bp0 = jnp.full(tmax.shape, -1.0)
hits = jax.jit(lambda ids, enear, en, bt, bp: tk.hits(tb, ids, en, o, d, tmin, bt, bp, False, enear=enear))
dt, (bt, bp) = timeit(hits, ids, enear, en, bt0, bp0)
print(f"hits round1 (early-break): {dt*1e3:.2f} ms")
hitsnb = jax.jit(lambda ids, en, bt, bp: tk.hits(tb, ids, en, o, d, tmin, bt, bp, False, enear=None))
dt, _ = timeit(hitsnb, ids, en, bt0, bp0)
print(f"hits round1 (no break):    {dt*1e3:.2f} ms")
