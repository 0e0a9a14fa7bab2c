"""Isolate the streaming kernel's per-visit fixed cost on real frame data.

Reconstructs the flat engine's exact emission lists/gates for the dragon
frame in XLA, then times ``super_hits.hits2`` with (a) the real gate
masks and (b) all-zero gate masks — the zero-gate run does every DMA and
every scalar-loop visit but zero Möller work, so (a) - (b) is pure Möller
and (b) / visits is the per-visit fixed cost. Run at block and quarter
granularity.

PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_visit.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


from tracer.accel import flat as F
from tracer.kernels.intersect import Rays
from tracer.kernels.super_hits import NSUB, SUPER, hits2
from tracer.render.integrator import camera_rays, pixel_uv
from tracer.scenes import build_scene, get_scene

desc = get_scene("Project: Dragon")
scene, cfg = build_scene(desc)
tb = scene.tb
w, h = cfg.width, cfg.height
n = w * h
u, v = pixel_uv(w, h)
rays = camera_rays(scene.camera, u, v, jnp.zeros((n, 2)))
rays = Rays(rays.o, rays.d, jnp.full(n, cfg.eta, jnp.float32),
            jnp.full(n, cfg.tmax, jnp.float32))


@jax.jit
def prep(rays_o, rays_d, tmin, tmax):
    from functools import partial

    tile = partial(F.to_supers, W=w, H=h)
    o = tile(rays_o, fill=1.0e30)
    d = tile(rays_d, fill=1.0)
    tm = tile(tmin, fill=1.0)
    tx = tile(tmax, fill=0.0)
    n_super = o.shape[0]
    sb = F.sub_bounds(o, d, tm, tx)
    super_bounds = (
        jnp.min(sb[:, :, 0:3], axis=1),
        jnp.max(sb[:, :, 3:6], axis=1),
        jnp.min(sb[:, :, 6:9], axis=1),
        jnp.max(sb[:, :, 9:12], axis=1),
        jnp.min(jnp.where(sb[:, :, 13] > 0.5, sb[:, :, 12], F._BIG), axis=1),
        jnp.max(
            jnp.where(
                tx.reshape(n_super, -1) > tm.reshape(n_super, -1),
                tx.reshape(n_super, -1), -F._BIG,
            ), axis=1,
        ),
        jnp.any(sb[:, :, 13] > 0.5, axis=1),
    )
    ok, near = F._frustum_cull(tb, super_bounds)
    K = min(F.K_EMIT, tb.blocks.shape[0])
    negnear, ids = lax.top_k(jnp.where(ok, -near, -F._INF), K)
    enear = -negnear
    prune_sub = jnp.max(
        jnp.where(
            tx.reshape(n_super, NSUB, -1) > tm.reshape(n_super, NSUB, -1),
            tx.reshape(n_super, NSUB, -1), -F._BIG,
        ), axis=2,
    )
    gm, near_t = F._sub_gates(tb, ids, sb, prune_sub, with_near=True)
    gated = (gm != 0) & (enear < F._INF)
    key = jnp.where(gated, -near_t, -F._INF)
    negnear2, sel = lax.top_k(key, K)
    ids_b = jnp.take_along_axis(ids, sel, axis=1)
    gm_b = jnp.take_along_axis(gm, sel, axis=1)
    enear_b = -negnear2
    en_b = jnp.sum(gated, axis=1, dtype=jnp.int32)
    qids, qnear, qgm, qn = F._quarter_emissions(tb, ids, enear, sb, prune_sub)
    return (o, d, tm, tx, ids_b, enear_b, gm_b, en_b, qids, qnear, qgm, qn)


(o, d, tm, tx, ids_b, enear_b, gm_b, en_b, qids, qnear, qgm, qn) = jax.tree.map(
    jax.block_until_ready, prep(rays.o, rays.d, rays.tmin, rays.tmax)
)
n_super = o.shape[0]
bp0 = jnp.full((n_super, SUPER), -1.0, jnp.float32)
log(f"supers {n_super}  block emissions {int(jnp.sum(en_b))}  "
    f"quarter emissions {int(jnp.sum(qn))}")


def bench(name, ids, enear, en, gm, quarter):
    def run(k, seed):
        def body(i, acc):
            bt, bp = hits2(
                tb, ids, enear, en, gm, o, d,
                tm + (seed + i) * jnp.float32(1e-9), tx, bp0,
                any_hit=False, quarter=quarter,
            )
            return acc + jnp.sum(bt[::7, ::127])
        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    f1 = jax.jit(lambda s: run(1, s))
    fR = jax.jit(lambda s: run(11, s))
    float(f1(jnp.float32(0.5)))
    float(fR(jnp.float32(1.5)))
    best = 1e9
    for k in range(3):
        a, b = jnp.float32(10 + k), jnp.float32(20 + k)
        t0 = time.perf_counter()
        float(f1(a))
        t1 = time.perf_counter()
        float(fR(b))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 10)
    log(f"{name:34s} {best*1e3:7.2f} ms")
    return best


zeros_gm_b = jnp.zeros_like(gm_b)
zeros_gm_q = jnp.zeros_like(qgm)

tb_ms = bench("block: real gates", ids_b, enear_b, en_b, gm_b, False)
tz_ms = bench("block: zero gates (visits only)", ids_b, enear_b, en_b,
              zeros_gm_b, False)
tq_ms = bench("quarter: real gates", qids, qnear, qn, qgm, True)
tqz_ms = bench("quarter: zero gates (visits only)", qids, qnear, qn,
               zeros_gm_q, True)

log(f"block Moller-only: {1e3*(tb_ms - tz_ms):.2f} ms | "
    f"quarter Moller-only: {1e3*(tq_ms - tqz_ms):.2f} ms")
