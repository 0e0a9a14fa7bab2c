"""Instrument flat round-body pieces on the dragon (TPU)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tracer.accel import flat
from tracer.kernels import treelet_hits as tk
from tracer.kernels.intersect import Rays
from tracer.render.camera import camera_rays, pixel_uv
from tracer.scenes import build_scene, get_scene


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


desc = get_scene("Project: Dragon")
scene, cfg = build_scene(desc)
tb = scene.tb
W, H = cfg.width, cfg.height
u, v = pixel_uv(W, H)
r0 = camera_rays(scene.camera, u, v)
rays = Rays(r0.o, r0.d, jnp.full((W * H,), 1e-3), jnp.full((W * H,), 5000.0))

o = flat.to_tiles(rays.o, W, H, 1.0e30)
d = flat.to_tiles(rays.d, W, H, 1.0)
tmin = flat.to_tiles(rays.tmin, W, H, 1.0)
tmax = flat.to_tiles(rays.tmax, W, H, 0.0)
n_tiles = o.shape[0]
K = flat.K_EMIT

cull = jax.jit(lambda pr: flat._frustum_cull(tb, flat._tile_bounds(o, d, tmin, pr)))
dt, (ok, near) = timeit(cull, tmax)
print(f"bounds+cull: {dt*1e3:.2f} ms")

comp = jax.jit(lambda ok, near, cur: flat._compact_round(ok, near, cur, K))
cur0 = jnp.full((n_tiles,), -1, jnp.int32)
dt, (ids, en, cur, ovf) = timeit(comp, ok, near, cur0)
print(f"compact: {dt*1e3:.2f} ms; en mean {float(jnp.mean(en)):.1f} "
      f"overflow {int(jnp.sum(ovf))}")

bt0 = tmax
bp0 = jnp.full((n_tiles, flat.TILE), -1.0)
hits = jax.jit(
    lambda ids, en, bt, bp: tk.hits(tb, ids, en, o, d, tmin, bt, bp, False)
)
dt, (bt, bp) = timeit(hits, ids, en, bt0, bp0)
print(f"pallas hits round1: {dt*1e3:.2f} ms")

# round 2
dt, (ok2, near2) = timeit(cull, bt)
dt2, (ids2, en2, cur2, ovf2) = timeit(comp, ok2, near2, cur)
print(f"round2 cull {dt*1e3:.2f} compact {dt2*1e3:.2f}; en2 mean "
      f"{float(jnp.mean(en2)):.2f} max {int(jnp.max(en2))} overflow {int(jnp.sum(ovf2))}")
dt, _ = timeit(hits, ids2, en2, bt, bp)
print(f"pallas hits round2: {dt*1e3:.2f} ms")

# how many rounds total?
cur_i, bt_i, bp_i = cur, bt, bp
r = 1
while True:
    ok_i, near_i = cull(bt_i)
    ids_i, en_i, cur_i, ovf_i = comp(ok_i, near_i, cur_i)
    if not bool(jnp.any(ovf_i)) and r > 1:
        break
    bt_i, bp_i = hits(ids_i, en_i, bt_i, bp_i)
    r += 1
    if r > 40:
        break
print(f"rounds: {r}")
