"""Gradient-step attribution: bisect the dragon cotangent graph.

PROFILE finding 16 parked the grad cost as "XLA scheduling of the
cotangent subgraph". This harness de-parks it without a device profiler
by measuring jitted grad steps over *subsets* of the scene pytree
(stop-gradient bisection) plus remat policies.

Measurement pattern: repeated launches with a varying scalar input
(launch overhead ~15 ms on the axon tunnel is common to every variant, so
deltas attribute cleanly). The fori-loop rep pattern of profile_device
reliably trips `INVALID_ARGUMENT: TPU backend error` on re-invocation for
grad programs on this backend — do not use it here.

Additionally, the backend tolerates only ~2 large loaded executables per
process (a third big program — or a reload after eviction — throws
INVALID_ARGUMENT regardless of content), so the driver runs ONE stage per
subprocess (--stage NAME).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_grad.py
"""
import dataclasses
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


STAGES = [
    "null", "fwd_while", "fwd_scan", "full_grad", "grad_camera",
    "grad_verts", "grad_materials", "remat_full", "remat_dots", "scan_d1",
    "verts_sg_t", "verts_sg_n", "fetch_only",
]

if "--stage" not in sys.argv:
    for st in STAGES:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--stage", st],
            env=os.environ,
        )
    sys.exit(0)

STAGE = sys.argv[sys.argv.index("--stage") + 1]

from tracer.diff import grad as G
from tracer.scenes import build_scene, get_scene
from tracer.util import replace

desc = get_scene("Project: Dragon")
t0 = time.perf_counter()
scene, cfg = build_scene(desc)
log(f"build_scene: {time.perf_counter()-t0:.2f}s")
gcfg = dataclasses.replace(cfg, loop="scan", max_depth=2)
n = cfg.width * cfg.height
target0 = jnp.zeros((n, 3), jnp.float32)


def loss_of(s, c=gcfg):
    img = G.render_radiance(s, c)
    return jnp.mean((img - target0) ** 2)


def nudge(s, e):
    return replace(s, camera=replace(s.camera, eye=s.camera.eye + e))


def bench(name, fn2, reps=5, tries=3):
    """fn2(scene, e) -> value; jitted with the scene passed as an
    ARGUMENT (closing over the ~0.5 GB scene pytree embeds it as program
    constants, which this backend tolerates for only a couple of
    programs per process before throwing INVALID_ARGUMENT)."""
    for attempt in range(tries):
        try:
            f = jax.jit(fn2)
            jax.block_until_ready(f(scene, jnp.float32(0.0)))
            ts = []
            for i in range(reps):
                e = jnp.float32((i + 1) * 1e-6)
                t0 = time.perf_counter()
                jax.block_until_ready(f(scene, e))
                ts.append(time.perf_counter() - t0)
            log(f"{name:44s} {min(ts)*1e3:8.1f} ms (launch incl.)")
            return min(ts) * 1e3
        except Exception as ex:
            log(f"{name}: attempt {attempt} failed: "
                f"{type(ex).__name__}: {ex}")
            time.sleep(3)
    return None


def consume(g):
    tot = jnp.float32(0.0)
    for l in jax.tree.leaves(g):
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating):
            tot = tot + jnp.sum(l).astype(jnp.float32)
    return tot


_only = lambda name: name == STAGE
if _only("null"):
    bench("null launch (scene in, scalar out)", lambda s, e: e * 2.0)
if _only("fwd_while"):
    bench("fwd while d=10 (render path)",
          lambda s, e: loss_of(nudge(s, e), dataclasses.replace(
              cfg, loop="while")))
if _only("fwd_scan"):
    bench("fwd scan d=2 (grad fwd)", lambda s, e: loss_of(nudge(s, e)))
if _only("full_grad"):
    bench("full grad (bench step)",
          lambda s, e: consume(jax.grad(loss_of, allow_int=True)(
              nudge(s, e))))


def fam(name, get, set_):
    def f(s, e):
        theta = jax.tree.map(lambda x: x + e, get(s))
        return consume(jax.grad(lambda th: loss_of(set_(s, th)))(theta))
    bench(f"grad wrt {name} only", f)


if _only("grad_camera"):
    fam("camera", lambda s: s.camera,
        lambda s, th: replace(s, camera=th))
if _only("grad_verts"):
    fam(
        "vertices+normals",
        lambda s: (s.geom.vertices, s.geom.normals),
        lambda s, th: replace(
            s, geom=replace(s.geom, vertices=th[0], normals=th[1])
        ),
    )
if _only("verts_sg_t"):
    os.environ["TRACER_GRAD_PROBE"] = "sg_t"
    fam(
        "verts+norms, t-chain CUT (normals only)",
        lambda s: (s.geom.vertices, s.geom.normals),
        lambda s, th: replace(
            s, geom=replace(s.geom, vertices=th[0], normals=th[1])
        ),
    )
if _only("verts_sg_n"):
    os.environ["TRACER_GRAD_PROBE"] = "sg_n"
    fam(
        "verts+norms, normal-chain CUT (t only)",
        lambda s: (s.geom.vertices, s.geom.normals),
        lambda s, th: replace(
            s, geom=replace(s.geom, vertices=th[0], normals=th[1])
        ),
    )
if _only("fetch_only"):
    # Fetch + scatter in isolation: fixed hit ids, loss = sum of rows.
    from tracer.geometry.device import fetch_tri_rows

    T_tris = scene.geom.indices.shape[0]
    tri_fixed = (
        jnp.arange(n, dtype=jnp.int32) * 7919
    ) % jnp.int32(T_tris)

    def floss(s, e):
        rows = fetch_tri_rows(
            s.geom.vertices + e, s.geom.normals, s.geom.tri_table,
            s.geom.indices, tri_fixed,
        )
        return jnp.sum(rows[:, 0:18] ** 2)

    def f(s, e):
        theta = (s.geom.vertices, s.geom.normals)

        def lo(th):
            s2 = replace(
                s, geom=replace(s.geom, vertices=th[0], normals=th[1])
            )
            return floss(s2, e)

        g = jax.grad(lo)(theta)
        return consume(g)

    bench("fetch+scatter only (fixed ids)", f)
if _only("grad_materials"):
    fam(
        "materials",
        lambda s: s.materials,
        lambda s, th: replace(s, materials=th),
    )

for pol in ("full", "dots"):
    if not _only(f"remat_{pol}"):
        continue
    c2 = dataclasses.replace(gcfg, remat=pol)
    bench(f"full grad, remat={pol}",
          lambda s, e, c2=c2: consume(jax.grad(
              lambda ss: loss_of(ss, c2), allow_int=True)(nudge(s, e))))

if _only("scan_d1"):
    c1 = dataclasses.replace(gcfg, max_depth=1)
    bench("full grad, scan d=1",
          lambda s, e: consume(jax.grad(
              lambda ss: loss_of(ss, c1), allow_int=True)(nudge(s, e))))
