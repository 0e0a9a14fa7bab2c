"""Pallas TPU kernel: streaming ray-tile x treelet-block intersection.

This is the hot half of the packet traversal (tracer.accel.packet): for each
ray tile, the treelet ids emitted by the top-tree walk are consumed by a
double-buffered DMA pipeline — block k+1 streams HBM->VMEM while block k is
tested — and the test itself is one dense (T, TILE) Moller evaluation per
block: triangles live on the sublane axis, rays on the lane axis, so every
op is a full-width VPU instruction and there is not a single gather.

The per-tile emission count is a scalar-prefetch operand, so dead tiles
(sky) cost one grid step and zero DMA. The reference analog is the
per-thread leaf loop of ``/root/reference/res/shaders/bvh.wgsl:154-191`` +
``intersect_triangle_indexed``; here the "thread" is a whole pixel tile and
the "leaf" is a 2-4 KB triangle block sized for DMA efficiency.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.0e38  # plain float: a jnp scalar would be a captured constant in the kernel


def use_pallas() -> bool:
    """Pallas on real TPU; interpret-mode coverage via TRACER_FORCE_PALLAS."""
    if os.environ.get("TRACER_NO_PALLAS"):
        return False
    if os.environ.get("TRACER_FORCE_PALLAS"):
        return True
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _moller_tile(blk, rt, upper):
    """(16, T) feature-major block vs (TILE, 8) transposed ray tile ->
    per-ray (TILE, 1) best (t, pid).

    Triangle features broadcast from (1, T) rows, ray features from
    (TILE, 1) columns; all math lands on (TILE, T) — rays on sublanes,
    triangles filling the 128-lane axis: every op is a dense VPU
    instruction and there is not a single gather.
    """
    c = lambda j: blk[j : j + 1, :]  # (1, T)
    rx = lambda j: rt[:, j : j + 1]  # (TILE, 1)
    ox, oy, oz = rx(0), rx(1), rx(2)
    dx, dy, dz = rx(3), rx(4), rx(5)
    tn = rx(6)
    nx, ny, nz = c(11), c(12), c(13)
    denom = nx * dx + ny * dy + nz * dz  # (TILE, T)
    inv = 1.0 / denom
    t = (c(14) - (nx * ox + ny * oy + nz * oz)) * inv
    sx = c(0) - ox
    sy = c(1) - oy
    sz = c(2) - oz
    nomx = sy * dz - sz * dy
    nomy = sz * dx - sx * dz
    nomz = sx * dy - sy * dx
    beta = (nomx * c(6) + nomy * c(7) + nomz * c(8)) * inv
    gamma = -(nomx * c(3) + nomy * c(4) + nomz * c(5)) * inv
    ok = (
        (beta >= 0.0)
        & (gamma >= 0.0)
        & (beta + gamma <= 1.0)
        & (t >= tn)
        & (t < upper)
        & (c(10) > 0.5)
    )
    tc = jnp.where(ok, t, _INF)
    tbest = jnp.min(tc, axis=1, keepdims=True)  # (TILE, 1)
    pidw = jnp.where(tc <= tbest, c(9), _INF)
    pbest = jnp.min(pidw, axis=1, keepdims=True)
    pbest = jnp.where(tbest < _INF, pbest, -1.0)
    return tbest, pbest


def _kernel(
    ids_ref,
    en_ref,
    enear_ref,
    blocks_hbm,
    rays_ref,
    best_ref,
    out_ref,
    scratch,
    sems,
    *,
    K: int,
    any_hit: bool,
):
    n = en_ref[0, 0, 0]
    rt = jnp.transpose(rays_ref[0])  # (8, TILE) -> (TILE, 8), once per tile
    bt0 = jnp.transpose(best_ref[0, 0:1, :])  # (TILE, 1)
    bp0 = jnp.transpose(best_ref[0, 1:2, :])
    if any_hit:
        # Occluded lanes stop participating: an upper bound of -INF fails
        # every t-window test and drops out of the max-based break bound.
        bt0 = jnp.where(bp0 > 0.0, -_INF, bt0)

    def dma(slot, k):
        return pltpu.make_async_copy(
            blocks_hbm.at[ids_ref[0, 0, k]], scratch.at[slot], sems.at[slot]
        )

    @pl.when(n > 0)
    def _():
        dma(0, 0).start()

    # Emissions arrive near-ordered, so once every live lane's best-t (or,
    # for any-hit, every unoccluded lane's window top) is closer than the
    # next block's conservative entry distance, no later block can matter:
    # break, saving both the tests and the remaining DMAs.
    def cond(carry):
        k, bt, bp, ub = carry
        return (k < n) & (enear_ref[0, 0, k] < ub)

    def body(carry):
        k, bt, bp, _ub = carry

        @pl.when(k + 1 < n)
        def _():
            dma((k + 1) % 2, k + 1).start()

        dma(k % 2, k).wait()
        blk = scratch[k % 2]  # (16, T)
        t, pid = _moller_tile(blk, rt, bt)
        if any_hit:
            hitk = t < _INF
            bp = jnp.where(hitk, 1.0, bp)
            bt = jnp.where(hitk, -_INF, bt)
        else:
            better = t < bt
            bt = jnp.where(better, t, bt)
            bp = jnp.where(better, pid, bp)
        return k + 1, bt, bp, jnp.max(bt)

    k, bt, bp, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), bt0, bp0, _INF)
    )
    # A broken-out-of loop may have started the next block's DMA; retire it
    # so the semaphore is clean for the next grid step.
    @pl.when(k < n)
    def _():
        dma(k % 2, k).wait()

    if any_hit:
        bt = jnp.transpose(best_ref[0, 0:1, :])  # window top unchanged
    out_ref[0, 0:1, :] = jnp.transpose(bt)
    out_ref[0, 1:2, :] = jnp.transpose(bp)


def hits(tb, eids, en, o, d, tmin, best_t, best_pid, any_hit: bool,
         enear=None):
    """Consume one round of emissions; returns updated (best_t, best_pid).

    best_pid is carried as f32 (prim ids are exact in f32 below 2^24); for
    any-hit it is the blocked flag (1.0 / -1.0 semantics via > 0).
    ``enear``: per-emission conservative entry distance in near order —
    enables the in-kernel early break. Pass None to disable (zeros).
    """
    n_tiles, TILE = tmin.shape
    T = tb.T
    K = eids.shape[1]
    NT = tb.blocks.shape[0]
    rays8 = jnp.stack(
        [o[..., 0], o[..., 1], o[..., 2], d[..., 0], d[..., 1], d[..., 2],
         tmin, best_t],
        axis=1,
    )  # (n_tiles, 8, TILE)
    best = jnp.stack([best_t, best_pid], axis=1)  # (n_tiles, 2, TILE)
    ids2 = jnp.clip(eids, 0, NT - 1).reshape(n_tiles, 1, K)
    en2 = en.reshape(n_tiles, 1, 1)
    if enear is None:
        enear = jnp.zeros((n_tiles, K), jnp.float32)
    enear2 = enear.reshape(n_tiles, 1, K)

    # Per-tile ids/count ride in small blocked SMEM operands (K words per
    # grid step) rather than whole-array scalar prefetch, which hits the
    # 1 MB SMEM ceiling at ~2.9k tiles x K=128.
    out = pl.pallas_call(
        functools.partial(_kernel, K=K, any_hit=any_hit),
        grid=(n_tiles,),
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
            pl.BlockSpec(memory_space=pl.ANY),  # blocks stay in HBM
            pl.BlockSpec(
                (1, 8, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 2, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 16, T), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((n_tiles, 2, TILE), jnp.float32),
        interpret=_interpret(),
    )(ids2, en2, enear2, tb.blocks, rays8, best)
    return out[:, 0], out[:, 1]
