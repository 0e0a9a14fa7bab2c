"""Profile the packet traversal phases on the dragon bench scene (TPU).

Times: phase A (top-tree walk) alone, phase B (hits kernel) alone on phase
A's real emissions, full closest_hit, and reports round/emission stats.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tracer.accel import packet as P
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


def main():
    desc = get_scene("Project: Dragon")
    cfg = desc.cfg
    t0 = time.perf_counter()
    scene, cfg = build_scene(desc)
    print(f"scene build: {time.perf_counter() - t0:.2f}s", flush=True)
    tb = scene.tb
    print(f"top rows {tb.top.shape[0]}, treelets {tb.blocks.shape[0]}, "
          f"depth {tb.depth}, T {tb.T}")

    W, H = cfg.width, cfg.height
    u, v = pixel_uv(W, H)
    r0 = camera_rays(scene.camera, u, v)
    o, d = r0.o, r0.d
    rays = Rays(o, d, jnp.full((W * H,), 1e-3), jnp.full((W * H,), 5000.0))

    # --- Full closest_hit.
    f = jax.jit(lambda r: P.closest_hit(r, tb, frame=(W, H)))
    dt, (t, pid) = timeit(f, rays)
    print(f"closest_hit: {dt*1e3:.2f} ms  ({W*H/dt/1e6:.1f} Mray/s)")
    print(f"hit fraction: {float(jnp.mean((pid >= 0))):.3f}")

    # --- Phase A alone (first round, untightened prune).
    tile = lambda x, fill: P.to_tiles(x, W, H, fill)
    o_t = tile(o, 1.0e30)
    d_t = tile(d, 1.0)
    tmin_t = tile(rays.tmin, 1.0)
    tmax_t = tile(rays.tmax, 0.0)
    n_tiles = o_t.shape[0]
    C = min(P.CHUNK_TILES, n_tiles)
    pad = (-n_tiles) % C
    if pad:
        o_t = jnp.concatenate([o_t, jnp.full((pad, P.TILE, 3), 1.0e30)])
        d_t = jnp.concatenate([d_t, jnp.ones((pad, P.TILE, 3))])
        tmin_t = jnp.concatenate([tmin_t, jnp.ones((pad, P.TILE))])
        tmax_t = jnp.concatenate([tmax_t, jnp.zeros((pad, P.TILE))])
    nc = (n_tiles + pad) // C
    print(f"n_tiles {n_tiles} -> chunks {nc} x {C}")
    resh = lambda x: x.reshape(nc, C, *x.shape[1:])
    och, dch = resh(o_t), resh(d_t)
    tminch, tmaxch = resh(tmin_t), resh(tmax_t)
    D = max(tb.depth, 1)

    def phase_a(st, prune):
        def fstep(args):
            s, oo, dd, tn, pr = args
            return P._phase_a_chunk(tb.top, D, P.K_EMIT, s, oo, dd, tn, pr)
        return jax.lax.map(fstep, (st, och, dch, tminch, prune))

    st0 = P._init_state(nc, C, D)
    pa = jax.jit(phase_a)
    dt_a, (st1, (eids, enear, en)) = timeit(pa, st0, tmaxch)
    print(f"phase A round 1: {dt_a*1e3:.2f} ms")
    en_np = np.asarray(en).reshape(-1)[:n_tiles]
    paused = np.asarray(st1.paused).reshape(-1)[:n_tiles]
    print(f"emissions/tile: mean {en_np.mean():.1f} max {en_np.max()} "
          f"paused {paused.sum()}/{n_tiles}")

    # --- Phase B alone on those emissions.
    flat = lambda x: x.reshape(nc * C, *x.shape[2:])
    bt0 = flat(tmaxch)
    bp0 = jnp.full((nc * C, P.TILE), -1.0)

    def phase_b(eids, en, bt, bp):
        return P._dispatch_hits(
            tb, eids, None, en, flat(och), flat(dch), flat(tminch),
            bt, bp, False,
        )

    pb = jax.jit(phase_b)
    dt_b, (bt1, bp1) = timeit(pb, flat(eids), flat(en), bt0, bp0)
    print(f"phase B round 1: {dt_b*1e3:.2f} ms")

    # --- Round 2 (resumed, tightened prune).
    dt_a2, (st2, (eids2, enear2, en2)) = timeit(
        pa, st1, bt1.reshape(nc, C, P.TILE)
    )
    en2_np = np.asarray(en2).reshape(-1)[:n_tiles]
    paused2 = np.asarray(st2.paused).reshape(-1)[:n_tiles]
    print(f"phase A round 2: {dt_a2*1e3:.2f} ms; emissions mean "
          f"{en2_np.mean():.1f} paused {paused2.sum()}")
    dt_b2, _ = timeit(pb, flat(eids2), flat(en2), bt1, bp1)
    print(f"phase B round 2: {dt_b2*1e3:.2f} ms")

    # Count total rounds the production loop takes.
    st, bt, bp = st1, bt1, bp1
    rounds = 1
    while bool(np.asarray(st.paused).any()) and rounds < 64:
        st, (ei, _, e) = pa(st, bt.reshape(nc, C, P.TILE))
        bt, bp = pb(flat(ei), flat(e), bt, bp)
        rounds += 1
    print(f"total rounds to converge: {rounds}")


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def flat_main():
    from tracer.accel import flat
    desc = get_scene("Project: Dragon")
    scene, cfg = build_scene(desc)
    tb = scene.tb
    W, H = cfg.width, cfg.height
    u, v = pixel_uv(W, H)
    r0 = camera_rays(scene.camera, u, v)
    rays = Rays(r0.o, r0.d, jnp.full((W * H,), 1e-3), jnp.full((W * H,), 5000.0))

    f = jax.jit(lambda r: flat.closest_hit(r, tb, frame=(W, H)))
    dt, (t, pid) = timeit(f, rays)
    print(f"flat closest_hit: {dt*1e3:.2f} ms ({W*H/dt/1e6:.1f} Mray/s)")
    print(f"hit fraction: {float(jnp.mean((pid >= 0))):.3f}")

    # Emission stats for round 1.
    o = flat.to_tiles(rays.o, W, H, 1.0e30)
    d = flat.to_tiles(rays.d, W, H, 1.0)
    tmin = flat.to_tiles(rays.tmin, W, H, 1.0)
    tmax = flat.to_tiles(rays.tmax, W, H, 0.0)
    bounds = flat._tile_bounds(o, d, tmin, tmax)
    ok, near = flat._frustum_cull(tb, bounds)
    en = np.asarray(jnp.sum(ok, axis=1))
    print(f"emissions/tile: mean {en.mean():.1f} max {en.max()} "
          f">K {(en > flat.K_EMIT).sum()}")

    # Shadow rays: directional light, origins at the hit points.
    hitm = pid >= 0
    pos = rays.o + t[:, None] * rays.d
    ld = -jnp.asarray(cfg.dir_light_direction) / np.linalg.norm(cfg.dir_light_direction)
    srays = Rays(
        pos + 1e-3 * ld[None, :],
        jnp.broadcast_to(ld, pos.shape),
        jnp.full((W * H,), 1e-3),
        jnp.where(hitm, 5000.0, 0.0),
    )
    g = jax.jit(lambda r: flat.any_hit(r, tb, frame=(W, H)))
    dt, occ = timeit(g, srays)
    print(f"flat shadow any_hit: {dt*1e3:.2f} ms; occluded "
          f"{float(jnp.mean(occ)):.3f}")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "flat":
    flat_main()
