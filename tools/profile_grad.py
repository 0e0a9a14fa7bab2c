"""Gradient-step attribution: bisect the 95 ms dragon cotangent graph.

PROFILE finding 16 parked the grad cost as "XLA scheduling of the cotangent
subgraph". This harness de-parks it without a device profiler, by measuring
jitted grad steps over *subsets* of the scene pytree (stop-gradient
bisection), remat policies, and fwd-only baselines — all with the
device-side rep-loop staging of tools/profile_device.py (finding 14).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_grad.py
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


from tracer.diff import grad as G
from tracer.render import integrator as I
from tracer.scenes import build_scene, get_scene
from tracer.util import replace

desc = get_scene(sys.argv[1] if len(sys.argv) > 1 else "Project: Dragon")
t0 = time.perf_counter()
scene, cfg = build_scene(desc)
log(f"build_scene: {time.perf_counter()-t0:.2f}s")
gcfg = dataclasses.replace(cfg, loop="scan", max_depth=2)
n = cfg.width * cfg.height
target0 = jnp.zeros((n, 3), jnp.float32)
R = 5


def bench(name, fn, tries=3):
    """fn(eps_scalar) -> pytree/array; rep-looped on device."""

    def run_k(eps, k):
        def body(i, acc):
            out = fn(eps + jnp.float32(i) * 1e-9)
            leaves = jax.tree.leaves(out)
            # Consume EVERY element of every leaf (full sums): slicing a
            # single row would let XLA dead-code parts of the cotangent.
            tot = jnp.float32(0.0)
            for l in leaves:
                if hasattr(l, "dtype") and jnp.issubdtype(
                    l.dtype, jnp.floating
                ):
                    tot = tot + jnp.sum(l).astype(jnp.float32)
            return acc + tot

        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    for attempt in range(tries):
        try:
            f1 = jax.jit(lambda e: run_k(e, 1))
            fR = jax.jit(lambda e: run_k(e, R))
            jax.block_until_ready(f1(jnp.float32(0.0)))
            jax.block_until_ready(fR(jnp.float32(0.0)))
            t1s, tRs = [], []
            for i in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f1(jnp.float32(i) * 1e-6))
                t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                jax.block_until_ready(fR(jnp.float32(i) * 1e-6 + 1e-7))
                tRs.append(time.perf_counter() - t0)
            dt = (min(tRs) - min(t1s)) / (R - 1) * 1e3
            log(f"{name:52s} {dt:8.2f} ms")
            return dt
        except Exception as e:
            log(f"{name}: attempt {attempt} failed: {type(e).__name__}: {e}")
            time.sleep(2)
    return None


def loss_of_scene(s, c=gcfg):
    img = G.render_radiance(s, c)
    return jnp.mean((img - target0) ** 2)


# --- Baselines.
bench("fwd only (scan d=2)", lambda e: loss_of_scene(
    replace(scene, camera=replace(
        scene.camera, eye=scene.camera.eye + e))))

bench("full grad (bench.py's step)", lambda e: jax.grad(
    lambda s: loss_of_scene(s), allow_int=True)(
        replace(scene, camera=replace(
            scene.camera, eye=scene.camera.eye + e))))

# --- Leaf-family bisection: grad wrt ONE family, rest closed over.
def fam(name, get, set_):
    def g(e):
        theta = jax.tree.map(lambda x: x + e, get(scene))
        return jax.grad(
            lambda th: loss_of_scene(set_(scene, th)))(theta)
    bench(f"grad wrt {name} only", g)


fam("camera", lambda s: s.camera, lambda s, th: replace(s, camera=th))
fam(
    "vertices",
    lambda s: s.geom.vertices,
    lambda s, th: replace(s, geom=replace(s.geom, vertices=th)),
)
fam(
    "normals",
    lambda s: s.geom.normals,
    lambda s, th: replace(s, geom=replace(s.geom, normals=th)),
)
fam(
    "vertices+normals",
    lambda s: (s.geom.vertices, s.geom.normals),
    lambda s, th: replace(
        s, geom=replace(s.geom, vertices=th[0], normals=th[1])
    ),
)
fam(
    "materials",
    lambda s: s.materials,
    lambda s, th: replace(s, materials=th),
)
fam(
    "uniforms(dir light)+camera",
    lambda s: (s.camera, s.uniforms.uv_scale),
    lambda s, th: replace(
        s, camera=th[0], uniforms=replace(s.uniforms, uv_scale=th[1])
    ),
)

# --- Remat policies over the full pytree.
for pol in ("full", "dots"):
    c2 = dataclasses.replace(gcfg, remat=pol)
    bench(f"full grad, remat={pol}", lambda e, c2=c2: jax.grad(
        lambda s: loss_of_scene(s, c2), allow_int=True)(
            replace(scene, camera=replace(
                scene.camera, eye=scene.camera.eye + e))))

# --- Depth-1 scan (isolates the second bounce's cotangent cost).
c1 = dataclasses.replace(gcfg, max_depth=1)
bench("full grad, scan d=1", lambda e: jax.grad(
    lambda s: loss_of_scene(s, c1), allow_int=True)(
        replace(scene, camera=replace(
            scene.camera, eye=scene.camera.eye + e))))
