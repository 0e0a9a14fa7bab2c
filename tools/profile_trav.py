"""Profile the dragon traversal hot path on TPU (dev scratch, not shipped)."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

def log(*a):
    print(*a, file=sys.stderr, flush=True)

from tracer.scenes import build_scene, get_scene
from tracer.render.integrator import pixel_uv, camera_rays
from tracer.kernels.intersect import Rays
from tracer.accel import wide as W

t0 = time.perf_counter()
desc = get_scene("Project: Dragon")
cfg = desc.cfg
import tracer.scenes.build as B
scene, cfg = build_scene(desc)
log(f"scene build total: {time.perf_counter()-t0:.2f}s")
log(f"wide table rows: {scene.wide.table.shape}, depth {scene.wide.depth}")

w, h = cfg.width, cfg.height
u, v = pixel_uv(w, h)
n = w * h
rays = camera_rays(scene.camera, u, v, jnp.zeros((n, 2), jnp.float32))
rays = Rays(rays.o, rays.d, jnp.full(n, cfg.eta, jnp.float32), jnp.full(n, cfg.tmax, jnp.float32))

# instrumented single-chunk traversal returning iteration count
import tracer.accel.wide as wide_mod

def traverse_iters(r, wb):
    out = None
    # replicate _traverse but return `it`
    import types
    src_fn = wide_mod._traverse
    # monkeypatch: call the while loop by copying function but we need `it`.
    # Easier: re-run with MAX_ITERS variants; instead just call internal and time.
    return src_fn(r, wb, False)

CH = 16384
nchunks = (n + CH - 1) // CH
log(f"rays {n}, chunks {nchunks} of {CH}")

def chunk_rays(i):
    s = slice(i*CH, min(n, (i+1)*CH))
    pad = CH - (s.stop - s.start)
    def p(x, fill):
        x = np.asarray(x[s])
        if pad: x = np.concatenate([x, np.full((pad,)+x.shape[1:], fill, x.dtype)])
        return jnp.asarray(x)
    return Rays(p(rays.o, 1e30), p(rays.d, 1.0), p(rays.tmin, 1.0), p(rays.tmax, 0.0))

trav = jax.jit(lambda r, wb: wide_mod._traverse(r, wb, False))

# warm up compile
r0 = chunk_rays(0)
t0 = time.perf_counter()
t, pid = trav(r0, scene.wide)
jax.block_until_ready(t)
log(f"compile+run chunk0: {time.perf_counter()-t0:.2f}s")

# per-chunk timing
times = []
for i in range(nchunks):
    ri = chunk_rays(i)
    jax.block_until_ready(ri.o)
    t0 = time.perf_counter()
    t, pid = trav(ri, scene.wide)
    jax.block_until_ready(t)
    times.append(time.perf_counter()-t0)
log(f"per-chunk times: min {min(times)*1e3:.1f}ms max {max(times)*1e3:.1f}ms total {sum(times)*1e3:.1f}ms")

# fixed-iteration cost: hack MAX_ITERS
orig = wide_mod.MAX_ITERS
for iters in (32, 128, 512):
    wide_mod.MAX_ITERS = iters
    travN = jax.jit(lambda r, wb: wide_mod._traverse(r, wb, False))
    t, pid = travN(r0, scene.wide); jax.block_until_ready(t)
    t0 = time.perf_counter()
    for _ in range(3):
        t, pid = travN(r0, scene.wide)
    jax.block_until_ready(t)
    dt = (time.perf_counter()-t0)/3
    log(f"MAX_ITERS={iters}: {dt*1e3:.2f}ms -> {dt/iters*1e6:.1f}us/iter")
wide_mod.MAX_ITERS = orig
