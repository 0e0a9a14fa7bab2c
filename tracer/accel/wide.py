"""Wide (8-ary) BVH — the TPU-shaped traversal structure.

Why this exists: on TPU, XLA gathers cost ~3 ns *per row* regardless of row
width (measured up to 128 words/row), while scatters cost ~3.5x a gather.
A binary BVH walk does many narrow gathers + stack scatters per step — the
worst possible shape. This structure inverts that:

* **one fat row per traversal step**: a node row packs EITHER 8 children
  AABBs + refs (inner) OR up to 8 whole triangles + their ids (leaf) into a
  single 96-word gather;
* **zero scatters**: ordered depth-first traversal uses a base-8 *trail*
  integer (Laine-style restart trail) + parent refs instead of a stack;
* **8-wide slab tests and rank selection** are dense VPU arithmetic.

The reference's analogous component is the flattened binary ``GpuNode`` BVH +
per-thread stack (``/root/reference/src/data_structures/hlbvh.rs:195-234``,
``res/shaders/bvh.wgsl:127-191``); this is its TPU-native redesign, built by
collapsing the binary LBVH from ``tracer.accel.lbvh``.

Row layout (width 96 f32, ints bitcast):
  [0]  parent ref (i32; -1 at root)
  [1]  leaf count (i32; 0 => inner node)
  inner: [2 .. 50)  8 children x (minx,miny,minz,maxx,maxy,maxz)
         [50 .. 58) 8 children refs (i32; -1 empty, else row index)
  leaf:  [2 .. 74)  8 triangles x 9 vertex floats (v0,v1,v2)
         [74 .. 82) 8 original triangle ids (i32; -1 padding)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tracer.accel.lbvh import BvhBuffers
from tracer.kernels.intersect import Rays
from tracer.util import pytree_dataclass

ROW = 96
B = 8  # branching factor
K = 8  # max triangles per leaf row
# 4-bit trail digits (rank can reach 8) packed into TWO int32 words:
# levels 0..7 in the low word, 8..15 in the high word.
MAX_LEVELS = 16
_INF = np.float32(3.0e38)


@pytree_dataclass(static=("depth",))
class WideBvh:
    table: jnp.ndarray  # (M, 96) f32
    depth: int = MAX_LEVELS


def _subtree_prims(bvh: BvhBuffers):
    """Contiguous sorted-prim range (first, count) of every node — Karras
    ranges are contiguous, so any subtree is a slice of prim_ids."""
    M = bvh.left.shape[0]
    first = bvh.first.astype(np.int64).copy()
    count = bvh.count.astype(np.int64).copy()
    internal = bvh.count == 0
    il = bvh.left[internal].astype(np.int64)
    ir = bvh.right[internal].astype(np.int64)
    ii = np.nonzero(internal)[0]
    for _ in range(64):
        nf = np.minimum(first[il], first[ir])
        nc = count[il] + count[ir]
        if np.array_equal(nf, first[ii]) and np.array_equal(nc, count[ii]):
            break
        first[ii] = nf
        count[ii] = nc
    return first, count


def build(bvh: BvhBuffers, vertices: np.ndarray, indices: np.ndarray) -> WideBvh:
    """Collapse a binary LBVH into the wide single-table layout.

    Greedy expansion: starting from a binary node, repeatedly split the
    child subtree with the most primitives until 8 slots are filled; any
    slot whose subtree holds <= 8 primitives becomes a packed leaf row.
    """
    sub_first, sub_count = _subtree_prims(bvh)
    verts = np.asarray(vertices, np.float32)
    idx = np.asarray(indices, np.int64)
    prim_ids = bvh.prim_ids.astype(np.int64)

    rows: list[np.ndarray] = []

    def new_row(parent: int) -> int:
        r = np.zeros(ROW, np.float32)
        r[0] = np.int32(parent).view(np.float32)
        rows.append(r)
        return len(rows) - 1

    def fill_leaf(row_id: int, first: int, count: int) -> None:
        r = rows[row_id]
        r[1] = np.int32(count).view(np.float32)
        ids = prim_ids[first : first + count]
        tri = idx[ids]
        v = verts[tri.reshape(-1)].reshape(count, 9)
        r[2 : 2 + count * 9] = v.reshape(-1)
        pid = np.full(K, -1, np.int32)
        pid[:count] = ids.astype(np.int32)
        r[74:82] = pid.view(np.float32)

    def node_bbox(i: int):
        return bvh.node_min[i], bvh.node_max[i]

    max_depth = 0

    def emit(node: int, parent_row: int, depth: int) -> int:
        """Emit binary subtree `node` as one wide row; returns row id."""
        nonlocal max_depth
        max_depth = max(max_depth, depth)
        me = new_row(parent_row)
        if sub_count[node] <= K:
            fill_leaf(me, int(sub_first[node]), int(sub_count[node]))
            return me
        # Inner: greedily split the largest slots until B children.
        slots = [node]
        while len(slots) < B:
            # pick the splittable slot with the most primitives
            cand = [s for s in slots if bvh.count[s] == 0 and sub_count[s] > K]
            if not cand:
                break
            s = max(cand, key=lambda x: sub_count[x])
            slots.remove(s)
            slots.extend([int(bvh.left[s]), int(bvh.right[s])])
        r = rows[me]
        refs = np.full(B, -1, np.int32)
        for ci, s in enumerate(slots):
            lo, hi = node_bbox(s)
            r[2 + ci * 6 : 2 + ci * 6 + 3] = lo
            r[2 + ci * 6 + 3 : 2 + ci * 6 + 6] = hi
            refs[ci] = emit(s, me, depth + 1)
        rows[me][50:58] = refs.view(np.float32)
        return me

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 100000))
    try:
        emit(0, -1, 1)
    finally:
        sys.setrecursionlimit(old)
    assert max_depth <= MAX_LEVELS, f"wide BVH depth {max_depth} > {MAX_LEVELS}"
    table = np.stack(rows)
    return WideBvh(table=jnp.asarray(table), depth=max_depth)


# ---------------------------------------------------------------------------
# Traversal
# ---------------------------------------------------------------------------

MAX_ITERS = 2048


def _unpack_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _trail_digit(lo, hi, lvl):
    """Read the 4-bit rank digit of level ``lvl`` from the two trail words."""
    lvl_c = jnp.clip(lvl, 0, MAX_LEVELS - 1)
    word = jnp.where(lvl_c < 8, lo, hi)
    shift = (lvl_c & 7) * 4
    return (word >> shift) & 15


def _trail_clear(lo, hi, lvl):
    lvl_c = jnp.clip(lvl, 0, MAX_LEVELS - 1)
    mask = ~(jnp.int32(15) << ((lvl_c & 7) * 4))
    return (
        jnp.where(lvl_c < 8, lo & mask, lo),
        jnp.where(lvl_c < 8, hi, hi & mask),
    )


def _trail_incr(lo, hi, lvl):
    lvl_c = jnp.clip(lvl, 0, MAX_LEVELS - 1)
    add = jnp.int32(1) << ((lvl_c & 7) * 4)
    return (
        jnp.where(lvl_c < 8, lo + add, lo),
        jnp.where(lvl_c < 8, hi, hi + add),
    )


def _traverse(rays: Rays, wb: WideBvh, any_hit: bool):
    """Ordered DFS over the wide tree, trail-based (no stack arrays).

    Per-lane state: current row id, level, base-8 trail (rank per level),
    best (t, prim). One table gather per iteration; everything else is dense
    VPU math. Any-hit retires a lane at its first confirmed intersection.
    """
    n = rays.o.shape[0]
    table = wb.table
    o = rays.o
    d = rays.d
    inv_d = 1.0 / d
    tmin0 = rays.tmin

    def cond(st):
        it, cur, level, trail_lo, trail_hi, best_t, best_id = st
        return (it < MAX_ITERS) & jnp.any(cur >= 0)

    def body(st):
        it, cur, level, trail_lo, trail_hi, best_t, best_id = st
        active = cur >= 0
        row = table[jnp.clip(cur, 0, table.shape[0] - 1)]  # (N, 96)
        parent = _unpack_i32(row[:, 0])
        leaf_count = _unpack_i32(row[:, 1])
        is_leaf = leaf_count > 0

        # ---- Leaf: test K triangles (dense, data already in-row).
        lt = best_t
        lid = best_id
        tri_block = row[:, 2:74]
        pid_block = _unpack_i32(row[:, 74:82])
        hit_any_leaf = jnp.zeros(n, bool)
        for k in range(K):
            base = k * 9
            v0 = tri_block[:, base : base + 3]
            v1 = tri_block[:, base + 3 : base + 6]
            v2 = tri_block[:, base + 6 : base + 9]
            e0 = v1 - v0
            e1 = v2 - v0
            o_to_v0 = v0 - o
            nrm = jnp.cross(e0, e1)
            nom = jnp.cross(o_to_v0, d)
            denom = jnp.sum(d * nrm, axis=-1)
            inv = 1.0 / denom
            beta = jnp.sum(nom * e1, axis=-1) * inv
            gamma = -jnp.sum(nom * e0, axis=-1) * inv
            t = jnp.sum(o_to_v0 * nrm, axis=-1) * inv
            pid = pid_block[:, k]
            ok = (
                is_leaf
                & (k < leaf_count)
                & (pid >= 0)
                & (beta >= 0.0)
                & (gamma >= 0.0)
                & (beta + gamma <= 1.0)
                & (t >= tmin0)
                & (t <= lt)
            )
            lid = jnp.where(ok, pid, lid)
            lt = jnp.where(ok, t, lt)
            hit_any_leaf = hit_any_leaf | ok
        best_t = jnp.where(active, lt, best_t)
        best_id = jnp.where(active, lid, best_id)

        # ---- Inner: 8-wide slab test + rank selection.
        boxes = row[:, 2:50].reshape(n, B, 6)
        refs = _unpack_i32(row[:, 50:58])  # (N, 8)
        t0 = (boxes[:, :, 0:3] - o[:, None, :]) * inv_d[:, None, :]
        t1 = (boxes[:, :, 3:6] - o[:, None, :]) * inv_d[:, None, :]
        near = jnp.max(jnp.minimum(t0, t1), axis=-1)  # (N, 8)
        far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        valid = (refs >= 0) & (near <= far) & (far >= tmin0[:, None])
        # Fixed membership & ordering (independent of the shrinking best_t)
        # so ranks are stable across repeat visits.
        tkey = jnp.where(valid, jnp.maximum(near, 0.0), _INF)
        # rank_j = #{k: t_k < t_j or (t_k == t_j and k < j)}
        tk = tkey[:, :, None]  # over k
        tj = tkey[:, None, :]  # over j
        kk = jnp.arange(B)[:, None]
        jj = jnp.arange(B)[None, :]
        less = (tk < tj) | ((tk == tj) & (kk < jj))
        rank = jnp.sum(less, axis=1).astype(jnp.int32)  # (N, 8)
        n_valid = jnp.sum(valid, axis=1).astype(jnp.int32)

        r = _trail_digit(trail_lo, trail_hi, level)  # rank at this level

        sel = rank == r[:, None]
        sel_ref = jnp.sum(jnp.where(sel, refs, 0), axis=1)
        sel_near = jnp.sum(jnp.where(sel, tkey, 0.0), axis=1)
        has_sel = (r < n_valid) & (sel_near < best_t)

        descend = active & ~is_leaf & has_sel
        go_up = active & ~descend  # leaf done, ranks exhausted, or pruned
        if any_hit:
            # retire immediately on any confirmed hit
            retired = active & (best_id >= 0)
            descend = descend & ~retired
            go_up = go_up & ~retired

        # Descend: level+1, child's rank digit reset to 0.
        lvl_d = level + 1
        trail_d_lo, trail_d_hi = _trail_clear(trail_lo, trail_hi, lvl_d)

        # Up: level-1, parent's rank digit += 1, clear this level's digit.
        lvl_u = level - 1
        trail_u_lo, trail_u_hi = _trail_clear(trail_lo, trail_hi, level)
        trail_u_lo, trail_u_hi = _trail_incr(trail_u_lo, trail_u_hi, lvl_u)

        cur_next = jnp.where(
            descend, sel_ref, jnp.where(go_up & (lvl_u >= 0), parent, cur)
        )
        done_now = go_up & (lvl_u < 0)
        if any_hit:
            done_now = done_now | (active & (best_id >= 0))
        cur_next = jnp.where(done_now, -1, cur_next)
        cur_next = jnp.where(active, cur_next, cur)
        level = jnp.where(descend, lvl_d, jnp.where(go_up, lvl_u, level))
        trail_lo = jnp.where(
            descend, trail_d_lo, jnp.where(go_up, trail_u_lo, trail_lo)
        )
        trail_hi = jnp.where(
            descend, trail_d_hi, jnp.where(go_up, trail_u_hi, trail_hi)
        )
        return it + 1, cur_next, level, trail_lo, trail_hi, best_t, best_id

    st = (
        jnp.int32(0),
        jnp.zeros(n, jnp.int32),  # start at root row 0
        jnp.zeros(n, jnp.int32),  # level 0
        jnp.zeros(n, jnp.int32),  # trail low word (levels 0..7)
        jnp.zeros(n, jnp.int32),  # trail high word (levels 8..15)
        rays.tmax,
        jnp.full(n, -1, jnp.int32),
    )
    _, _, _, _, _, best_t, best_id = jax.lax.while_loop(cond, body, st)
    return best_t, best_id


def closest_hit(rays: Rays, wb: WideBvh):
    """(t, prim_id) closest hit; prim_id == -1 on miss."""
    return _traverse(rays, wb, any_hit=False)


def any_hit(rays: Rays, wb: WideBvh):
    """Occlusion query over [tmin, tmax]."""
    _, pid = _traverse(rays, wb, any_hit=True)
    return pid >= 0
