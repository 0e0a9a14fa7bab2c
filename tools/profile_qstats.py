"""Quarter-gate statistics on a real frame: how much Möller work do the
emission gates admit now, vs what per-sub bounds from a finished frame
would admit (the two-phase-cull headroom)?

PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_qstats.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


from tracer.accel import flat as F
from tracer.kernels.intersect import Rays
from tracer.render import integrator as I
from tracer.scenes import build_scene, get_scene

desc = get_scene(sys.argv[1] if len(sys.argv) > 1 else "Project: Dragon")
scene, cfg = build_scene(desc)
w, h = cfg.width, cfg.height
n = w * h
u, v = I.pixel_uv(w, h)
jitter = jnp.zeros((n, 2), jnp.float32)
cam_rays = I.camera_rays(scene.camera, u, v, jitter)
rays = Rays(cam_rays.o, cam_rays.d, jnp.full(n, cfg.eta, jnp.float32),
            jnp.full(n, cfg.tmax, jnp.float32))
tb = scene.tb

# True closest-hit t per ray (the final bounds).
t_true, pid = F.closest_hit(rays, tb, frame=(w, h))
jax.block_until_ready(t_true)


@jax.jit
def stats(o_flat, d_flat, tmin_flat, tmax_flat, t_final):
    tile = lambda x, fill: F.to_supers(x, w, h, fill)
    o = tile(o_flat, 1.0e30)
    d = tile(d_flat, 1.0)
    tmin = tile(tmin_flat, 1.0)
    tmax = tile(tmax_flat, 0.0)
    tfin = tile(t_final, 0.0)
    ns = o.shape[0]
    NT = tb.blocks.shape[0]
    K = min(F.K_EMIT, NT)

    def gate_counts(prune_vec):
        sb = F.sub_bounds(o, d, tmin, prune_vec)
        super_bounds = (
            jnp.min(sb[:, :, 0:3], axis=1),
            jnp.max(sb[:, :, 3:6], axis=1),
            jnp.min(sb[:, :, 6:9], axis=1),
            jnp.max(sb[:, :, 9:12], axis=1),
            jnp.min(jnp.where(sb[:, :, 13] > 0.5, sb[:, :, 12], F._BIG),
                    axis=1),
            jnp.max(jnp.where(prune_vec.reshape(ns, -1) >
                              tmin.reshape(ns, -1),
                              prune_vec.reshape(ns, -1), -F._BIG), axis=1),
            jnp.any(sb[:, :, 13] > 0.5, axis=1),
        )
        ok_super, near = F._frustum_cull(tb, super_bounds)
        negnear, ids = jax.lax.top_k(jnp.where(ok_super, -near, -F._INF), K)
        prune_sub = jnp.max(
            jnp.where(
                prune_vec.reshape(ns, F.NSUB, F.SUB) >
                tmin.reshape(ns, F.NSUB, F.SUB),
                prune_vec.reshape(ns, F.NSUB, F.SUB), -F._BIG),
            axis=2,
        )
        okq, nearq = F._sub_gates_raw(tb, ids, sb, prune_sub)
        okq = okq & (negnear > -F._INF)[:, :, None, None]
        qpairs = jnp.sum(okq)  # (sub, quarter) gated pairs
        bpairs = jnp.sum(jnp.any(okq, axis=-1))  # block-level pairs
        qemit = jnp.sum(jnp.any(okq, axis=2))  # quarter emissions (DMAs)
        return qpairs, bpairs, qemit

    # (a) initial windows (what the single-phase stream gates today)
    a = gate_counts(tmax)
    # (b) final bounds + small slack (what a perfect prepass would admit)
    b = gate_counts(jnp.minimum(tfin * 1.001 + 1e-3, tmax))
    return a, b


(aq, ab, ae), (bq, bb, be) = jax.tree.map(
    np.asarray, stats(rays.o, rays.d, rays.tmin, rays.tmax, t_true)
)
log(f"initial-window gates: quarter-pairs {aq}, block-pairs {ab}, "
    f"quarter DMAs {ae}")
log(f"final-bound gates:    quarter-pairs {bq}, block-pairs {bb}, "
    f"quarter DMAs {be}")
log(f"Möller admitted: now {aq * 128 * (tb.T // 4) / 1e6:.0f} M tests, "
    f"floor {bq * 128 * (tb.T // 4) / 1e6:.0f} M tests "
    f"({bq / max(aq, 1):.2%})")
