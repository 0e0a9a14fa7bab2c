"""Flat frustum traversal: dense super-tile culling + per-sub-tile hits.

The fully dense redesign of the reference's per-thread BVH walk
(``/root/reference/res/shaders/bvh.wgsl:154-191``) for *coherent* ray
wavefronts (primary rays, shadow rays): there is no tree and no walk.

* The frame is cut into 32x64-pixel **super-tiles** (2048 rays = 16
  sub-tiles of 8x16). Each super-tile is summarized by an interval bound
  (origin AABB, per-axis direction interval, t window).
* One dense (n_super, NT) conservative interval slab test culls every
  treelet against every super-tile in a single fused VPU pass; the
  survivors are compacted to a near-ordered top-K emission list with
  ``jax.lax.top_k``. Super granularity keeps both passes ~an order of
  magnitude cheaper than per-packet culling.
* The emissions feed the super-tile Pallas kernel
  (``tracer.kernels.super_hits``), which recovers sub-tile precision: each
  streamed block is slab-tested against all 16 sub-tile frustums, each
  sub-tile keeps its own monotone early-break bound, and the Moller tests
  are per-ray exact — so the conservative cull costs extra block tests,
  never correctness.

Super-tiles whose emission count exceeds K sweep the remaining blocks in
id order (rare: silhouette tiles with unbounded frustums), so arbitrarily
incoherent wavefronts stay correct — they just degrade toward brute force
over blocks, which is why the path-mode integrator keeps the per-ray
packet walk (``tracer.accel.packet``) instead.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from tracer.accel.treelet import TreeletBvh
from tracer.kernels.intersect import Rays
from tracer.kernels.super_hits import NSUB, SUB, SUPER

_INF = jnp.float32(3.0e38)
_BIG = jnp.float32(1.0e18)  # indefinite-interval sentinel (safe in products)
# Emission budget per super-tile. The dragon frame peaks at 54 super-cull
# survivors per super (mean 14, p99 42) — K=96 covers a 1.8x margin; the
# id-ordered overflow sweep keeps larger working sets exact (just slower),
# and the K-wide qbox row gather is per-INDEX priced (finding 19), so an
# oversized K is pure prep cost (K=256 measured +1 ms/frame of gather).
K_EMIT = int(os.environ.get("TRACER_KEMIT", "96"))
MAX_ROUNDS = 4096

# Quarter-block emission granularity (TRACER_QEMIT). Default ON since the
# r5 restructure: with the emission near-sort gone and the kernel
# skipping empty-gate entries before their DMA, the quarter-granularity
# kernel is strictly faster than block (7.9 vs 9.2 ms kernel-only;
# 15.8 vs 16.6 ms/frame on the dragon). The r4 "finer granularity
# loses" measurement (14.2 vs 12.0) was dominated by the KQ-wide
# near-sort top_k in the old _quarter_emissions prep, not per-visit cost.
QUARTER_EMIT = os.environ.get("TRACER_QEMIT", "1") != "0"

# Two-phase closest-hit stream (TRACER_2PHASE=1): phase 1 consumes the
# nearest PHASE1_EMITS emissions, then the tail is RE-GATED against the
# per-sub-tile best-t bounds phase 1 discovered. Measured SLOWER on the
# dragon (block: 13.9 vs 12.0 ms; quarter: 24 ms): the in-kernel
# monotone break already skips nearly everything the re-gate would kill,
# so the second kernel launch + re-gate pass is pure overhead. Kept as a
# measured A/B lever, default off; TRACER_P1M overrides the budget.
TWO_PHASE = os.environ.get("TRACER_2PHASE", "0") != "0"
PHASE1_EMITS = int(os.environ.get("TRACER_P1M", "48"))

# Super-tile pixel geometry: 4x4 grid of 8x16 sub-tiles.
SUP_H, SUP_W = 32, 64
SUB_H, SUB_W = 8, 16


def _pads(W: int, H: int):
    Hp = -(-H // SUP_H) * SUP_H
    Wp = -(-W // SUP_W) * SUP_W
    return Hp, Wp


def to_supers(x: jnp.ndarray, W: int, H: int, fill):
    """(H*W, ...) row-major -> (n_super, SUPER, ...); sub-tile-major inside
    each super-tile. Pure layout ops."""
    Hp, Wp = _pads(W, H)
    rest = x.shape[1:]
    img = x.reshape(H, W, *rest)
    pad = ((0, Hp - H), (0, Wp - W)) + ((0, 0),) * len(rest)
    img = jnp.pad(img, pad, constant_values=fill)
    img = img.reshape(
        Hp // SUP_H, 4, SUB_H, Wp // SUP_W, 4, SUB_W, *rest
    )
    perm = (0, 3, 1, 4, 2, 5) + tuple(range(6, 6 + len(rest)))
    return img.transpose(perm).reshape(-1, SUPER, *rest)


def from_supers(x: jnp.ndarray, W: int, H: int):
    Hp, Wp = _pads(W, H)
    rest = x.shape[2:]
    img = x.reshape(Hp // SUP_H, Wp // SUP_W, 4, 4, SUB_H, SUB_W, *rest)
    perm = (0, 2, 4, 1, 3, 5) + tuple(range(6, 6 + len(rest)))
    img = img.transpose(perm).reshape(Hp, Wp, *rest)
    return img[:H, :W].reshape(H * W, *rest)


def _linear_supers(x: jnp.ndarray, fill):
    """Fallback for non-frame wavefronts: consecutive-lane sub-tiles."""
    n = x.shape[0]
    pad = (-n) % SUPER
    rest = x.shape[1:]
    x = jnp.concatenate(
        [x, jnp.full((pad, *rest), fill, x.dtype)]
    ) if pad else x
    return x.reshape(-1, SUPER, *rest)


def _interval_fields(o, d, tmin, prune):
    """Interval summary over the last ray axis. o, d: (..., L, 3);
    tmin, prune: (..., L)."""
    alive = prune > tmin
    a3 = alive[..., None]
    o_lo = jnp.min(jnp.where(a3, o, _BIG), axis=-2)
    o_hi = jnp.max(jnp.where(a3, o, -_BIG), axis=-2)
    d_lo = jnp.min(jnp.where(a3, d, _BIG), axis=-2)
    d_hi = jnp.max(jnp.where(a3, d, -_BIG), axis=-2)
    tmin_lo = jnp.min(jnp.where(alive, tmin, _BIG), axis=-1)
    prune_hi = jnp.max(jnp.where(alive, prune, -_BIG), axis=-1)
    any_alive = jnp.any(alive, axis=-1)
    return o_lo, o_hi, d_lo, d_hi, tmin_lo, prune_hi, any_alive


def interval_slab(lo, hi, o_lo, o_hi, d_lo, d_hi):
    """Conservative [near_lb, far_ub] of a ray-set interval bound vs slabs.

    All args (..., 3), broadcastable. Handles sign-spanning direction
    intervals without giving up the axis: rays whose d_k crosses 0 still
    need t >= gap / max|d_k| to reach a slab the origin box is outside of
    — this is what keeps frame-center tiles (d_x, d_y spanning 0) tightly
    culled instead of degenerating to an unbounded slab.
    """
    a_lo = lo - o_hi
    a_hi = lo - o_lo
    b_lo = hi - o_hi
    b_hi = hi - o_lo
    definite = (d_lo > 0.0) | (d_hi < 0.0)
    # Definite sign: 1/d is a proper interval (same sign, no pole).
    safe_lo = jnp.where(definite, d_lo, 1.0)
    safe_hi = jnp.where(definite, d_hi, 1.0)
    inv_lo = 1.0 / safe_hi
    inv_hi = 1.0 / safe_lo
    t0_lo, t0_hi = _imul(a_lo, a_hi, inv_lo, inv_hi)
    t1_lo, t1_hi = _imul(b_lo, b_hi, inv_lo, inv_hi)
    near_def = jnp.minimum(t0_lo, t1_lo)
    far_def = jnp.maximum(t0_hi, t1_hi)
    # Sign-spanning: no exit bound, but a valid entry bound if the origin
    # box sits outside the slab (gap > 0).
    gap = jnp.maximum(jnp.maximum(a_lo, -b_hi), 0.0)
    amax = jnp.maximum(jnp.maximum(-d_lo, d_hi), 1e-30)
    near_ind = gap / amax
    near = jnp.max(jnp.where(definite, near_def, near_ind), axis=-1)
    far = jnp.min(jnp.where(definite, far_def, _BIG), axis=-1)
    return near, far


def sub_bounds(o, d, tmin, prune):
    """Per-sub-tile packed bounds (n_super, NSUB, 16) for the hits kernel.
    Rows: [o_lo3, o_hi3, d_lo3, d_hi3, tmin_lo, alive, pad2]."""
    n_super = o.shape[0]
    os = o.reshape(n_super, NSUB, SUB, 3)
    ds = d.reshape(n_super, NSUB, SUB, 3)
    tm = tmin.reshape(n_super, NSUB, SUB)
    pr = prune.reshape(n_super, NSUB, SUB)
    o_lo, o_hi, d_lo, d_hi, tmin_lo, _, any_alive = _interval_fields(
        os, ds, tm, pr
    )
    return jnp.concatenate(
        [
            o_lo,
            o_hi,
            d_lo,
            d_hi,
            tmin_lo[..., None],
            any_alive[..., None].astype(jnp.float32),
            jnp.zeros((n_super, NSUB, 2), jnp.float32),
        ],
        axis=-1,
    )


def _imul(x_lo, x_hi, y_lo, y_hi):
    p1 = x_lo * y_lo
    p2 = x_lo * y_hi
    p3 = x_hi * y_lo
    p4 = x_hi * y_hi
    return (
        jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
        jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)),
    )


def _frustum_cull(tb: TreeletBvh, bounds):
    """(n_super, NT) conservative hit mask + near lower bound."""
    o_lo, o_hi, d_lo, d_hi, tmin_lo, prune_hi, any_alive = bounds
    near, far = interval_slab(
        tb.t_lo[None, :, :],
        tb.t_hi[None, :, :],
        o_lo[:, None, :],
        o_hi[:, None, :],
        d_lo[:, None, :],
        d_hi[:, None, :],
    )
    ok = (
        (near <= far)
        & (far >= tmin_lo[:, None])
        & (near < prune_hi[:, None])
        & any_alive[:, None]
    )
    return ok, jnp.where(ok, jnp.maximum(near, 0.0), _INF)


def _sub_gates_raw(tb, ids, sb, prune_sub):
    """Per-(emission, sub-tile, quarter-block) conservative frustum tests.

    ids: (ns, K); sb: (ns, NSUB, 16) packed sub bounds;
    prune_sub: (ns, NSUB) initial per-sub window top.
    -> ok (ns, K, NSUB, NQ) bool, near (ns, K, NSUB, NQ) f32 (>= 0).
    """
    qb = tb.qbox[jnp.clip(ids, 0, tb.qbox.shape[0] - 1)]  # (ns, K, NQ, 6)
    lo = qb[:, :, None, :, 0:3]  # (ns, K, 1, NQ, 3)
    hi = qb[:, :, None, :, 3:6]
    o_lo = sb[:, None, :, None, 0:3]  # (ns, 1, NSUB, 1, 3)
    o_hi = sb[:, None, :, None, 3:6]
    d_lo = sb[:, None, :, None, 6:9]
    d_hi = sb[:, None, :, None, 9:12]
    near, far = interval_slab(lo, hi, o_lo, o_hi, d_lo, d_hi)
    tmin_lo = sb[:, None, :, None, 12]
    alive = sb[:, None, :, None, 13] > 0.5
    near = jnp.maximum(near, 0.0)
    ok = (
        (near <= far)
        & (far >= tmin_lo)
        & (near < prune_sub[:, None, :, None])
        & alive
    )  # (ns, K, NSUB, NQ)
    return ok, near


def _sub_gates(tb, ids, sb, prune_sub, with_near=False):
    """Per-(emission, sub-tile) gates packed to one 16-bit word per
    emission (block-granularity emission mode). One dense XLA pass over
    the top-K selected blocks — the Pallas kernel's hot loop then runs
    without a single vector op for culled work. -> (ns, K) i32.

    ``with_near=True`` additionally returns the tightened per-emission
    conservative entry distance: min over gated (sub, quarter) pairs of
    the per-sub quarter near — a strictly larger (= better-breaking)
    bound than the super-tile-level treelet-box near, for free since the
    per-pair nears are already computed for the gates.
    """
    ok, near = _sub_gates_raw(tb, ids, sb, prune_sub)
    # One bit per sub-tile, set iff ANY quarter box passes — strictly
    # tighter than a whole-block box test (the win of the quarter boxes)
    # while keeping the kernel's gate read one SMEM word per visit (a
    # per-sub nibble layout measured +10 ms/frame of scalar-load cost).
    sub_ok = jnp.any(ok, axis=-1)  # (ns, K, NSUB)
    powers = jnp.arange(NSUB, dtype=jnp.int32)
    gm = jnp.sum(
        sub_ok.astype(jnp.int32) << powers[None, None, :], axis=-1
    )  # (ns, K)
    if not with_near:
        return gm
    near_tight = jnp.min(
        jnp.where(ok, near, _INF), axis=(2, 3)
    )  # (ns, K)
    return gm, near_tight


def _quarter_emissions(tb, ids, enear, sb, prune_sub):
    """Expand block emissions to near-sorted quarter-block emissions.

    The super-level cull stays at treelet granularity (cheap dense pass
    over NT blocks); the emission list the kernel consumes is refined to
    quarter-blocks (T/NQ Morton-adjacent triangles) with per-sub gate
    bits and per-quarter conservative entry distances. This is the
    structural redundancy cut of PROFILE finding 11: the kernel's Möller
    dispatch shrinks 4x in granularity while its per-visit hot loop is
    unchanged (one SMEM gate word + one scalar entry bound per visit) —
    in-kernel quarter dispatch measured *slower* (22-24 ms vs 13).

    ids/enear: (ns, K) block emissions from the super cull.
    -> qids, qnear, qgm: (ns, K*NQ) near-sorted; qn: (ns,) gated count.
    """
    from tracer.accel.treelet import NQ

    ns, K = ids.shape
    ok, near = _sub_gates_raw(tb, ids, sb, prune_sub)  # (ns, K, NSUB, NQ)
    powers = jnp.arange(NSUB, dtype=jnp.int32)
    qgm = jnp.sum(
        ok.astype(jnp.int32) << powers[None, None, :, None], axis=2
    )  # (ns, K, NQ)
    # Entry bound for the shared stream: min over gated subs of the
    # per-sub conservative entry (each is a valid lower bound for its
    # sub's rays; the min is valid for every gated sub).
    qnear = jnp.min(jnp.where(ok, near, _INF), axis=2)  # (ns, K, NQ)
    qids = (
        ids[:, :, None] * NQ + jnp.arange(NQ, dtype=ids.dtype)[None, None, :]
    )
    gated = (qgm != 0) & (enear[:, :, None] < _INF)
    KQ = K * NQ
    key = jnp.where(gated, -qnear, -_INF).reshape(ns, KQ)
    negnear, sel = jax.lax.top_k(key, KQ)  # full near-sort, nothing dropped
    qids = jnp.take_along_axis(qids.reshape(ns, KQ), sel, axis=1)
    qgm = jnp.take_along_axis(qgm.reshape(ns, KQ), sel, axis=1)
    qn = jnp.sum(gated, axis=(1, 2), dtype=jnp.int32)
    return qids, -negnear, qgm, qn


def _qgate_ids(tb, qids, sb, prune_sub):
    """Per-(quarter id, sub-tile) gates for an explicit quarter-id list.

    Used by the phase-2 re-gate: same geometry test as _sub_gates_raw but
    against *updated* per-sub prune bounds. qids: (ns, Kq) quarter ids;
    -> gm (ns, Kq) i32 gate bits.
    """
    from tracer.accel.treelet import NQ

    NTQ = tb.qbox.shape[0] * NQ
    qb = tb.qbox.reshape(NTQ, 6)[jnp.clip(qids, 0, NTQ - 1)]  # (ns, Kq, 6)
    lo = qb[:, :, None, 0:3]
    hi = qb[:, :, None, 3:6]
    o_lo = sb[:, None, :, 0:3]
    o_hi = sb[:, None, :, 3:6]
    d_lo = sb[:, None, :, 6:9]
    d_hi = sb[:, None, :, 9:12]
    near, far = interval_slab(lo, hi, o_lo, o_hi, d_lo, d_hi)
    tmin_lo = sb[:, None, :, 12]
    alive = sb[:, None, :, 13] > 0.5
    ok = (
        (near <= far)
        & (far >= tmin_lo)
        & (jnp.maximum(near, 0.0) < prune_sub[:, None, :])
        & alive
    )  # (ns, Kq, NSUB)
    powers = jnp.arange(NSUB, dtype=jnp.int32)
    return jnp.sum(ok.astype(jnp.int32) << powers[None, None, :], axis=-1)


def _dispatch(tb, eids, enear, en, gm, o, d, tmin, bt, bp, any_hit,
              quarter=False):
    from tracer.kernels import treelet_hits as tk

    if tk.use_pallas():
        from tracer.kernels.super_hits import hits2

        return hits2(
            tb, eids, enear, en, gm, o, d, tmin, bt, bp, any_hit,
            quarter=quarter,
        )
    if quarter:
        return _phase_b_xla_q(tb, eids, en, o, d, tmin, bt, bp, any_hit)
    from tracer.accel.packet import _phase_b_xla

    return _phase_b_xla(tb, eids, en, o, d, tmin, bt, bp, any_hit)


def _phase_b_xla_q(tb, qids, en, o, d, tmin, best_t, best_pid, any_hit):
    """XLA fallback for quarter-block emissions (CPU correctness path)."""
    from tracer.accel.packet import _moller_block
    from tracer.accel.treelet import NQ

    NTQ = tb.qblocks.shape[0]
    K = qids.shape[1]

    def step(carry, k):
        bt, bp = carry
        qid = jnp.clip(qids[:, k], 0, NTQ - 1)
        blk = tb.qblocks[qid]  # (ns, 16, TQ)
        live = k < en
        upper = jnp.where(live[:, None], bt, -_INF)
        t, pid = _moller_block(blk, o, d, tmin, upper)
        if any_hit:
            bp = jnp.where(t < _INF, 1.0, bp)
        else:
            better = t < bt
            bt = jnp.where(better, t, bt)
            bp = jnp.where(better, pid, bp)
        return (bt, bp), None

    (bt, bp), _ = jax.lax.scan(step, (best_t, best_pid), jnp.arange(K))
    return bt, bp


# Temporal seed slack: the previous frame's hit distance at a jittered
# sub-pixel bounds this frame's within (surface slope x jitter); lanes
# whose true hit lands beyond the slack fall into the exact repair pass.
SEED_REL = 1.01
SEED_ABS = 1.0e-3


def _run(rays: Rays, tb: TreeletBvh, frame, any_hit: bool, K: int | None = None,
         seed_t=None):
    if K is None:
        K = K_EMIT  # read at call time so tests can shrink the budget
    n = rays.o.shape[0]
    if frame is not None and frame[0] * frame[1] == n:
        W, H = frame
        tile = partial(to_supers, W=W, H=H)
        untile = partial(from_supers, W=W, H=H)
    else:
        tile = _linear_supers
        untile = lambda x: x.reshape(-1)[:n]

    o = tile(rays.o, fill=1.0e30)
    d = tile(rays.d, fill=1.0)
    tmin = tile(rays.tmin, fill=1.0)
    tmax = tile(rays.tmax, fill=0.0)
    n_super = o.shape[0]
    NT = tb.blocks.shape[0]
    K = min(K, NT)

    sb = sub_bounds(o, d, tmin, tmax)
    # Super-tile bound = union of its sub-tiles (reduce the packed fields).
    super_bounds = (
        jnp.min(sb[:, :, 0:3], axis=1),
        jnp.max(sb[:, :, 3:6], axis=1),
        jnp.min(sb[:, :, 6:9], axis=1),
        jnp.max(sb[:, :, 9:12], axis=1),
        jnp.min(
            jnp.where(sb[:, :, 13] > 0.5, sb[:, :, 12], _BIG), axis=1
        ),
        jnp.max(
            jnp.where(
                tmax.reshape(n_super, -1) > tmin.reshape(n_super, -1),
                tmax.reshape(n_super, -1),
                -_BIG,
            ),
            axis=1,
        ),
        jnp.any(sb[:, :, 13] > 0.5, axis=1),
    )
    ok, near = _frustum_cull(tb, super_bounds)
    total = jnp.sum(ok, axis=1, dtype=jnp.int32)
    negnear, ids = jax.lax.top_k(jnp.where(ok, -near, -_INF), K)
    enear = -negnear  # ascending conservative entry distance; INF pad

    # Per-sub-tile gates for the selected emissions; emissions whose gate
    # mask is empty (super frustum passed, every sub frustum culled) are
    # compacted out by a second near-ordered top_k so the kernel never
    # DMAs them.
    prune_sub = jnp.max(
        jnp.where(
            tmax.reshape(n_super, NSUB, SUB) > tmin.reshape(n_super, NSUB, SUB),
            tmax.reshape(n_super, NSUB, SUB),
            -_BIG,
        ),
        axis=2,
    )
    # Temporal t-bound seeding (closest-hit only): clamp each lane's
    # initial best-t to last frame's hit distance (+ slack). The per-sub
    # SMEM break bounds then start TIGHT instead of being discovered
    # along the stream — the bound-discovery dynamics that set the
    # engine's floor (PROFILE finding 18) are skipped. Gates/emissions
    # keep the ORIGINAL windows, so the same emission list conservatively
    # covers both the seeded pass and the repair pass below.
    seeded_mask = None
    if seed_t is not None and not any_hit:
        st = tile(seed_t, fill=0.0)
        bound = st * jnp.float32(SEED_REL) + jnp.float32(SEED_ABS)
        seeded_mask = (st > 0.0) & (bound < tmax)
        bt0 = jnp.where(seeded_mask, bound, tmax)
    else:
        bt0 = tmax
    bp0 = jnp.full((n_super, SUPER), -1.0, jnp.float32)
    # No compaction pass: the kernel skips empty-gate emissions before
    # issuing their DMA (~3 scalar ops each, tracer.kernels.super_hits),
    # so the near-ordered top-K list is dispatched as-is. The r4 design's
    # second compaction top_k — and quarter mode's KQ-wide near-sort
    # (_quarter_emissions) — were the dominant *prep* cost; the kernel-only
    # A/B (tools/profile_visit.py) showed the quarter-granularity kernel
    # is FASTER than block (7.9 vs 9.2 ms on dragon), inverting the
    # finding-17 conclusion once prep is out of the picture.
    en1 = jnp.minimum(total, K)
    if QUARTER_EMIT:
        from tracer.accel.treelet import NQ

        ok_q, _near_q = _sub_gates_raw(tb, ids, sb, prune_sub)
        powers = jnp.arange(NSUB, dtype=jnp.int32)
        gm = jnp.sum(
            ok_q.astype(jnp.int32) << powers[None, None, :, None], axis=2
        ).reshape(n_super, K * NQ)  # (ns, K*NQ)
        ids = (
            ids[:, :, None] * NQ
            + jnp.arange(NQ, dtype=ids.dtype)[None, None, :]
        ).reshape(n_super, K * NQ)
        # Stream break key: the BLOCK near, replicated per quarter — the
        # stream is monotone in it (quarter nears are tighter but would
        # break the monotonicity the early-exit relies on).
        enear = jnp.repeat(enear, NQ, axis=1)
        en1 = en1 * NQ
        KD = K * NQ  # dispatch batch width (emission ids are quarters)
        ND = NT * NQ  # id-space size for the overflow sweep
        quarter = True
        regate = lambda tail_ids, prune2: _qgate_ids(tb, tail_ids, sb, prune2)
    else:
        gm = _sub_gates(tb, ids, sb, prune_sub)
        KD, ND, quarter = K, NT, False
        regate = lambda tail_ids, prune2: _sub_gates(tb, tail_ids, sb, prune2)

    M = PHASE1_EMITS
    if TWO_PHASE and not any_hit and KD > M:
        # Phase 1: nearest M emissions discover per-ray bounds cheaply
        # (the near stream carries most closest hits).
        bt, bp = _dispatch(
            tb, ids[:, :M], enear[:, :M], jnp.minimum(en1, M),
            gm[:, :M], o, d, tmin, bt0, bp0, any_hit, quarter=quarter,
        )
        # Phase 2: re-gate the tail against the per-sub best-t bounds
        # phase 1 found. The skipped phase-1 emissions need no replay:
        # the in-kernel break only skips work the re-gate also rejects
        # (both compare entry distance vs the same monotone bounds).
        alive0 = (tmax > tmin).reshape(n_super, NSUB, SUB)
        prune2 = jnp.max(
            jnp.where(alive0, bt.reshape(n_super, NSUB, SUB), -_BIG),
            axis=2,
        )
        tail_ids = ids[:, M:]
        tail_near = enear[:, M:]
        gm2 = regate(tail_ids, prune2)
        gated2 = (gm2 != 0) & (tail_near < _INF)
        key2 = jnp.where(gated2, -tail_near, -_INF)
        negn2, sel2 = jax.lax.top_k(key2, KD - M)
        ids2 = jnp.take_along_axis(tail_ids, sel2, axis=1)
        gmp2 = jnp.take_along_axis(gm2, sel2, axis=1)
        en2 = jnp.sum(gated2, axis=1, dtype=jnp.int32)
        bt, bp = _dispatch(
            tb, ids2, -negn2, en2, gmp2, o, d, tmin, bt, bp, any_hit,
            quarter=quarter,
        )
    else:
        bt, bp = _dispatch(
            tb, ids, enear, en1, gm, o, d, tmin, bt0, bp0, any_hit,
            quarter=quarter,
        )

    if seeded_mask is not None:
        # Exact repair: a seeded lane that found NOTHING under its clamped
        # window may have its true hit in (seed, tmax] — re-dispatch the
        # same (conservative, original-window) emission list with the full
        # window for exactly those lanes and a dead (-inf) window for the
        # rest. Steady state has zero unresolved lanes (the seed includes
        # slack), so the whole pass sits behind a lax.cond and costs one
        # any() reduce per frame.
        unresolved = (bp < 0.0) & seeded_mask

        def _repair(args):
            bt, bp = args
            btr, bpr = _dispatch(
                tb, ids, enear,
                jnp.where(jnp.any(unresolved, axis=1), en1, 0),
                gm, o, d, tmin,
                jnp.where(unresolved, tmax, -_INF),
                jnp.full_like(bp, -1.0),
                any_hit, quarter=quarter,
            )
            return (
                jnp.where(unresolved, btr, bt),
                jnp.where(unresolved, bpr, bp),
            )

        bt, bp = jax.lax.cond(
            jnp.any(unresolved), _repair, lambda args: args, (bt, bp)
        )

    # Overflow super-tiles (super-cull survivors > K) sweep the remaining
    # blocks in id order, en-gated so everyone else pays nothing.
    # Conservative superset (all sub-tiles gated on); the kernel's per-sub
    # bound check still culls, only the stream break is disabled
    # (enear = 0).
    overflow = total > K
    if NT > K:
        iota_ids = jnp.broadcast_to(
            jnp.arange(KD, dtype=jnp.int32)[None, :], (n_super, KD)
        )
        zeros = jnp.zeros((n_super, KD), jnp.float32)
        full_mask = jnp.full((n_super, KD), (1 << NSUB) - 1, jnp.int32)

        def round_body(carry):
            r, bt, bp = carry
            base = (r - 1) * KD  # sweep [0, ND): top-K picked by nearness
            ids_r = jnp.minimum(iota_ids + base, ND - 1)
            en_r = jnp.where(overflow, jnp.clip(ND - base, 0, KD), 0)
            bt, bp = _dispatch(
                tb, ids_r, zeros, en_r, full_mask, o, d, tmin, bt, bp,
                any_hit, quarter=quarter,
            )
            return r + 1, bt, bp

        def cond(c):
            return jnp.any(overflow) & ((c[0] - 1) * KD < ND) & (c[0] < MAX_ROUNDS)

        r_end, bt, bp = jax.lax.while_loop(
            cond, round_body, (jnp.int32(1), bt, bp)
        )
        # Converged iff the sweep covered every block before the round cap
        # (the reference crashes loudly on traversal overflow,
        # bvh.wgsl:139-148; we flag instead of hanging).
        conv_super = ~overflow | ((r_end - 1) * KD >= ND)
    else:
        conv_super = jnp.ones((n_super,), bool)

    bt = untile(bt)
    bp = untile(bp)
    conv = untile(
        jnp.broadcast_to(conv_super[:, None], (n_super, SUPER)).astype(
            jnp.float32
        )
    ) > 0.5
    return bt, bp, conv


def closest_hit(rays: Rays, tb: TreeletBvh, frame=None, with_conv=False,
                seed_t=None):
    """(t, prim_id) closest hit; prim_id == -1 on miss. Exact (the frustum
    cull is conservative; the per-ray hits kernel decides).

    ``seed_t``: optional (N,) per-ray upper-bound hint (0 = no hint),
    typically last frame's hit distance. EXACT regardless of hint quality:
    lanes whose hint undershoots are re-traced by the repair pass in
    ``_run``; a good hint only makes the stream break earlier.

    ``with_conv=True`` additionally returns a per-ray bool that is False
    when the overflow sweep hit its round cap before covering every block
    — a clipped traversal is detectable, never silent."""
    bt, bp, conv = _run(rays, tb, frame, any_hit=False, seed_t=seed_t)
    pid = bp.astype(jnp.int32)
    t = jnp.where(pid >= 0, bt, rays.tmax)
    if with_conv:
        return t, pid, conv
    return t, pid


def any_hit(rays: Rays, tb: TreeletBvh, frame=None, with_conv=False):
    """Occlusion query over [tmin, tmax]."""
    _, bp, conv = _run(rays, tb, frame, any_hit=True)
    if with_conv:
        return bp > 0.0, conv
    return bp > 0.0
