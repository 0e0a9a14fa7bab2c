"""Pallas TPU kernel: super-tile streaming hits with per-sub-tile culling.

v2 of the streaming hits stage (see ``tracer.kernels.treelet_hits`` for v1
and the design rationale). The emission list is per *super-tile* (a 32x64
pixel block = 16 sub-tiles of 8x16), which divides the XLA-side cull +
top-k cost by the super/sub ratio; the kernel recovers sub-tile precision:

* every streamed treelet block carries its AABB (a (K, 8) VMEM side table);
  one tiny VPU op slab-tests it against all 16 sub-tile interval frustums;
* each sub-tile keeps its own monotone break bound ``ub`` (max live
  best-t) in VMEM scratch; a block is Moller-tested only for sub-tiles
  whose frustum it passes and whose bound it beats (static 16-way unroll,
  predicated with ``pl.when``);
* the shared near-ordered stream breaks globally once every sub-tile's
  bound beats the next block's conservative entry distance.

Reference analog: the per-thread BVH walk + leaf loop of
``/root/reference/res/shaders/bvh.wgsl:154-191``; here one "thread" is a
2048-ray super-tile whose sixteen 128-ray packets share a single DMA
stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.kernels.treelet_hits import _interpret, _moller_tile, _INF

SUB = 128  # rays per sub-tile (8x16 pixels)
NSUB = 16  # sub-tiles per super-tile
SUPER = SUB * NSUB  # rays per super-tile (32x64 pixels)

# Sub-bounds feature rows (see flat.sub_bounds): 16 features per sub-tile.
# [0:3] o_lo  [3:6] o_hi  [6:9] d_lo  [9:12] d_hi  [12] tmin_lo
# [13] alive (1/0)  [14:16] pad
_BIG = 1.0e18


def _pretest(sb, box, ub):
    """Slab-test one block AABB against all sub-tile interval frustums
    (mirror of ``tracer.accel.flat.interval_slab`` semantics).

    sb: (NSUB, 16) sub-bounds; box: (1, 8) [lo3, hi3, pad2]; ub: (NSUB, 1).
    Returns a 1/0 f32 gate (NSUB, 1) — all tiny dense VPU instructions.
    """
    lo = box[:, 0:3]  # (1, 3)
    hi = box[:, 3:6]
    o_lo = sb[:, 0:3]  # (NSUB, 3)
    o_hi = sb[:, 3:6]
    d_lo = sb[:, 6:9]
    d_hi = sb[:, 9:12]
    a_lo = lo - o_hi
    a_hi = lo - o_lo
    b_lo = hi - o_hi
    b_hi = hi - o_lo
    definite = (d_lo > 0.0) | (d_hi < 0.0)
    safe_lo = jnp.where(definite, d_lo, 1.0)
    safe_hi = jnp.where(definite, d_hi, 1.0)
    inv_lo = 1.0 / safe_hi
    inv_hi = 1.0 / safe_lo

    def imul(x_lo, x_hi, y_lo, y_hi):
        p1 = x_lo * y_lo
        p2 = x_lo * y_hi
        p3 = x_hi * y_lo
        p4 = x_hi * y_hi
        return (
            jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
            jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)),
        )

    t0_lo, t0_hi = imul(a_lo, a_hi, inv_lo, inv_hi)
    t1_lo, t1_hi = imul(b_lo, b_hi, inv_lo, inv_hi)
    near_def = jnp.minimum(t0_lo, t1_lo)
    far_def = jnp.maximum(t0_hi, t1_hi)
    gap = jnp.maximum(jnp.maximum(a_lo, -b_hi), 0.0)
    amax = jnp.maximum(jnp.maximum(-d_lo, d_hi), 1e-30)
    near_ind = gap / amax
    near = jnp.max(
        jnp.where(definite, near_def, near_ind), axis=1, keepdims=True
    )
    far = jnp.min(
        jnp.where(definite, far_def, _BIG), axis=1, keepdims=True
    )
    tmin_lo = sb[:, 12:13]
    alive = sb[:, 13:14] > 0.5
    ok = (
        (near <= far)
        & (far >= tmin_lo)
        & (jnp.maximum(near, 0.0) < ub)
        & alive
    )
    # f32 gate: Mosaic can only extract 32-bit scalars from vectors.
    return jnp.where(ok, 1.0, 0.0)


def _kernel(
    ids_ref,
    en_ref,
    enear_ref,
    boxes_ref,
    subb_ref,
    blocks_hbm,
    rays_ref,
    best_ref,
    out_ref,
    rt_s,
    bt_s,
    bp_s,
    ub_s,
    blk_s,
    sems,
    *,
    K: int,
    any_hit: bool,
):
    n = en_ref[0, 0, 0]
    sb = subb_ref[0]  # (NSUB, 16)

    # Transpose rays once; park per-sub state in VMEM scratch.
    rt_s[:, :] = jnp.transpose(rays_ref[0])  # (SUPER, 8)
    bt0 = jnp.transpose(best_ref[0, 0:1, :])  # (SUPER, 1)
    bp0 = jnp.transpose(best_ref[0, 1:2, :])
    if any_hit:
        bt0 = jnp.where(bp0 > 0.0, -_INF, bt0)
    bt_s[:, :] = bt0
    bp_s[:, :] = bp0
    # Per-sub break bound = max best-t over its 128 lanes.
    ub_s[:, :] = jnp.max(bt0.reshape(NSUB, SUB), axis=1, keepdims=True)

    def dma(slot, k):
        return pltpu.make_async_copy(
            blocks_hbm.at[ids_ref[0, 0, k]], blk_s.at[slot], sems.at[slot]
        )

    NBUF = 4  # DMA pipeline depth

    for w in range(NBUF - 1):

        @pl.when(w < n)
        def _(w=w):
            dma(w, w).start()

    def cond(carry):
        k, gub = carry
        return (k < n) & (enear_ref[0, 0, k] < gub)

    def body(carry):
        k, _gub = carry

        @pl.when(k + NBUF - 1 < n)
        def _():
            dma((k + NBUF - 1) % NBUF, k + NBUF - 1).start()

        dma(k % NBUF, k).wait()
        blk = blk_s[k % NBUF]  # (16, T)
        box = boxes_ref[pl.ds(ids_ref[0, 0, k], 1), :]  # (1, 8)
        gate = _pretest(sb, box, ub_s[:, :])  # (NSUB, 1) 1/0 f32
        # One vector->scalar transfer instead of NSUB: pack the gates into
        # a bitmask and test bits on the scalar unit.
        powers = jax.lax.broadcasted_iota(jnp.int32, (NSUB, 1), 0)
        gmask = jnp.sum((gate > 0.0).astype(jnp.int32) << powers)

        for s in range(NSUB):

            @pl.when((gmask >> s) & 1 != 0)
            def _(s=s):
                rt = rt_s[s * SUB : (s + 1) * SUB, :]
                bt = bt_s[s * SUB : (s + 1) * SUB, :]
                bp = bp_s[s * SUB : (s + 1) * SUB, :]
                t, pid = _moller_tile(blk, rt, bt)
                if any_hit:
                    hitk = t < _INF
                    bp = jnp.where(hitk, 1.0, bp)
                    bt = jnp.where(hitk, -_INF, bt)
                else:
                    better = t < bt
                    bt = jnp.where(better, t, bt)
                    bp = jnp.where(better, pid, bp)
                bt_s[s * SUB : (s + 1) * SUB, :] = bt
                bp_s[s * SUB : (s + 1) * SUB, :] = bp
                ub_s[s : s + 1, 0:1] = jnp.max(bt, axis=(0, 1), keepdims=True)

        return k + 1, jnp.max(ub_s[:, :])

    k, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), _INF))

    # Retire DMAs already in flight past the break point.
    for w in range(NBUF - 1):

        @pl.when(k + w < n)
        def _(w=w):
            dma((k + w) % NBUF, k + w).wait()

    bt = bt_s[:, :]
    if any_hit:
        bt = jnp.transpose(best_ref[0, 0:1, :])  # window top unchanged
    out_ref[0, 0:1, :] = jnp.transpose(bt)
    out_ref[0, 1:2, :] = jnp.transpose(bp_s[:, :])


def hits2(tb, eids, enear, en, sub_bounds, o, d, tmin, best_t, best_pid,
          any_hit: bool):
    """Super-tile streaming hits; per-super emissions, per-sub culling.

    o, d: (n_super, SUPER, 3); tmin/best_t/best_pid: (n_super, SUPER);
    eids/enear: (n_super, K) near-ordered; sub_bounds: (n_super, NSUB, 16).
    """
    n_super = tmin.shape[0]
    T = tb.T
    K = eids.shape[1]
    NT = tb.blocks.shape[0]
    rays8 = jnp.stack(
        [o[..., 0], o[..., 1], o[..., 2], d[..., 0], d[..., 1], d[..., 2],
         tmin, best_t],
        axis=1,
    )  # (n_super, 8, SUPER)
    best = jnp.stack([best_t, best_pid], axis=1)
    ids2 = jnp.clip(eids, 0, NT - 1).reshape(n_super, 1, K)
    en2 = en.reshape(n_super, 1, 1)
    enear2 = enear.reshape(n_super, 1, K)

    out = pl.pallas_call(
        functools.partial(_kernel, K=K, any_hit=any_hit),
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, K), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, K), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            # Whole treelet box table resident in VMEM (~32 B/treelet),
            # indexed per block in-kernel — avoids a slow XLA-side gather.
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, NSUB, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # blocks stay in HBM
            pl.BlockSpec(
                (1, 8, SUPER), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 2, SUPER), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, SUPER), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((SUPER, 8), jnp.float32),  # transposed rays
            pltpu.VMEM((SUPER, 1), jnp.float32),  # best t
            pltpu.VMEM((SUPER, 1), jnp.float32),  # best pid
            pltpu.VMEM((NSUB, 1), jnp.float32),  # per-sub break bound
            pltpu.VMEM((4, 16, T), jnp.float32),  # pipelined blocks
            pltpu.SemaphoreType.DMA((4,)),
        ],
        out_shape=jax.ShapeDtypeStruct((n_super, 2, SUPER), jnp.float32),
        interpret=_interpret(),
    )(ids2, en2, enear2, tb.box_table, sub_bounds, tb.blocks, rays8, best)
    return out[:, 0], out[:, 1]
