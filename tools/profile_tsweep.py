"""Treelet-size sweep: engine cost vs T on the dragon scene.

Varies rays per rep via a pre-made device-side batch list (no per-rep
host->device scalar transfer, which costs ~15 ms of tunnel round trip)."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

def log(*a):
    print(*a, file=sys.stderr, flush=True)

from tracer.scenes import build_scene, get_scene
from tracer.scenes import cache as dc
from tracer.render import integrator as I
from tracer.kernels.intersect import Rays
from tracer.accel import flat as F, treelet, lbvh

desc = get_scene("Project: Dragon")
scene, cfg = build_scene(desc)
w, h = cfg.width, cfg.height
n = w * h
u, v = I.pixel_uv(w, h)

mesh = None
from tracer.scenes.build import _load_mesh_cached
mesh = _load_mesh_cached(desc.model, desc.model_scale)
binary = lbvh.build_for_mesh(mesh, max_prims=desc.bvh_leaf)

# Pre-made ray batches on device (varied jitter).
batches = []
for i in range(8):
    jit = jnp.full((n, 2), jnp.float32(i) * 1e-6)
    rays = I.camera_rays(scene.camera, u, v, jit)
    batches.append(Rays(rays.o, rays.d, jnp.full(n, cfg.eta, jnp.float32),
                        jnp.full(n, cfg.tmax, jnp.float32)))
jax.block_until_ready(batches[-1].o)


def bench_engine(tb, label):
    f = jax.jit(lambda r, tb: F.closest_hit(r, tb, frame=(w, h))[0])
    out = f(batches[0], tb)
    jax.block_until_ready(out)
    reps = 24
    t0 = time.perf_counter()
    for i in range(reps):
        out = f(batches[i % 8], tb)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    log(f"{label:34s} NT={tb.blocks.shape[0]:5d} {dt:8.2f} ms")
    return out


for T in (1024, 512, 256):
    host = treelet.build_host(binary, T=T)
    tb = treelet.from_host(host, jnp.asarray(mesh.vertices, jnp.float32),
                           jnp.asarray(mesh.indices.astype(np.int64), jnp.int32))
    jax.block_until_ready(tb.blocks)
    # emission stats
    bench_engine(tb, f"engine T={T}")
