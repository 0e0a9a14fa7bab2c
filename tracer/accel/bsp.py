"""BSP tree: builder (host NumPy) + lockstep device traversal (jnp).

Builder reproduces the course BSP of the reference
(``/root/reference/src/data_structures/bsp_tree.rs:45-323``): top-down spatial
partition, cost = count * area over 3 axes x 3 candidate planes (tests=4),
empty-side rescue shifting the plane past the extreme object by size/8
(min eps 1e-6), leaf when <= max_objects or depth == max_depth. Objects
straddling the plane go to *both* children. The reference flattens into a
complete binary tree array of 2^(d+1)-1 slots (``bsp_array``,
``bsp_tree.rs:120-189``); we store the equivalent information compactly
(DFS order, explicit child links) — identical traversal semantics without the
20 MB fixed-size array (the reference's own noted memory pain point,
``journal/src/project.md`` section 4.2.1.4).

Traversal mirrors ``intersect_trimesh`` (``res/shaders/bsp.wgsl:10-81``):
near/far child ordering by ray direction sign, plane t-test against the
current [tmin, tmax] interval, a branch stack of (node, tmin, tmax), and
early return on the first leaf containing a hit (valid because the interval
clipping visits leaves front-to-back). The scene-AABB interval clamp
(``aabb.wgsl:8-31``) is applied per ray before the walk.
"""

from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

from tracer.kernels.intersect import Rays, triangle_t
from tracer.util import StageTimer, pytree_dataclass

NODE_LEAF = 3  # axis codes 0/1/2, leaf = 3 (bsp_tree.rs:14)
F_EPS = 1e-6
MAX_DEPTH_DEFAULT = 20
MAX_OBJECTS_DEFAULT = 4
TESTS = 4


@pytree_dataclass(static=("max_level", "max_count"))
class BspBuffers:
    axis: np.ndarray  # (M,) i32 — split axis, or NODE_LEAF
    plane: np.ndarray  # (M,) f32
    left: np.ndarray  # (M,) i32
    right: np.ndarray  # (M,) i32
    first: np.ndarray  # (M,) i32 — leaf range start into prim_ids
    count: np.ndarray  # (M,) i32
    prim_ids: np.ndarray  # (K,) i32 — leaf-ordered ids (duplicates allowed:
    #                       straddling objects live in multiple leaves)
    bbox_lo: np.ndarray  # (3,)
    bbox_hi: np.ndarray  # (3,)
    max_level: int = MAX_DEPTH_DEFAULT
    max_count: int = MAX_OBJECTS_DEFAULT  # largest leaf population (static)


def build(
    prim_lo: np.ndarray,
    prim_hi: np.ndarray,
    max_depth: int = MAX_DEPTH_DEFAULT,
    max_objects: int = MAX_OBJECTS_DEFAULT,
    timer: StageTimer | None = None,
    prefer_native: bool = True,
) -> BspBuffers:
    """Build the BSP over primitive AABBs.

    Prefers the native C++ builder (``native/bsp.cpp``, the analog of the
    reference's compiled Rust builder); this NumPy implementation is the
    always-available reference path and produces an identical tree."""
    timer = timer if timer is not None else StageTimer()
    n = prim_lo.shape[0]
    assert 0 < max_depth < 32, "BspTree depth must be in (0, 32)"

    if prefer_native:
        try:
            from tracer.accel import native

            if native.bsp_available():
                f = native.bsp_build(
                    prim_lo, prim_hi, max_depth, max_objects, timer=timer
                )
                counts = f["count"]
                return BspBuffers(
                    axis=f["axis"], plane=f["plane"], left=f["left"],
                    right=f["right"], first=f["first"], count=counts,
                    prim_ids=f["prim_ids"], bbox_lo=f["bbox_lo"],
                    bbox_hi=f["bbox_hi"], max_level=max_depth,
                    max_count=int(counts.max()) if counts.size else 0,
                )
        except (OSError, RuntimeError, ValueError) as e:
            # Fall back to the NumPy reference implementation, but loudly:
            # a silent fallback here hides real native-layer bugs (stale
            # .so, argtype mismatch) behind a 30x slower build.
            print(
                f"[bsp] native builder failed ({e!r}); "
                "falling back to NumPy",
                file=sys.stderr,
            )

    root_lo = prim_lo.min(axis=0)
    root_hi = prim_hi.max(axis=0)

    axis_l, plane_l, left_l, right_l = [], [], [], []
    first_l, count_l = [], []
    prim_ids: list[int] = []

    def area(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    def emit():
        axis_l.append(0)
        plane_l.append(0.0)
        left_l.append(-1)
        right_l.append(-1)
        first_l.append(0)
        count_l.append(0)
        return len(axis_l) - 1

    def subdivide(ids: np.ndarray, lo, hi, depth: int) -> int:
        me = emit()
        if len(ids) <= max_objects or depth == max_depth:
            axis_l[me] = NODE_LEAF
            first_l[me] = len(prim_ids)
            count_l[me] = len(ids)
            prim_ids.extend(int(i) for i in ids)
            return me
        blo = prim_lo[ids]
        bhi = prim_hi[ids]
        best = (np.inf, 0, 0.0, 0, 0)
        for ax in range(3):
            for k in range(1, TESTS):
                center = (hi[ax] - lo[ax]) * (k / TESTS) + lo[ax]
                l_hi = hi.copy()
                l_hi[ax] = center
                r_lo = lo.copy()
                r_lo[ax] = center
                # Bbox::intersects is a closed-interval overlap test
                # (bbox.rs:151-155); against the child half-spaces it
                # reduces to these comparisons.
                lcnt = int((blo[:, ax] <= center).sum())
                rcnt = int((bhi[:, ax] >= center).sum())
                cost = lcnt * area(lo, l_hi) + rcnt * area(r_lo, hi)
                if cost < best[0]:
                    best = (cost, ax, center, lcnt, rcnt)
        _, ax, center, lcnt, rcnt = best
        size = hi[ax] - lo[ax]
        diff = size / 8.0 if F_EPS < size / 8.0 else F_EPS
        if lcnt == 0:
            center = float(blo[:, ax].min()) - diff
        if rcnt == 0:
            center = float(bhi[:, ax].max()) + diff
        l_hi = hi.copy()
        l_hi[ax] = center
        r_lo = lo.copy()
        r_lo[ax] = center
        lmask = blo[:, ax] <= center
        rmask = bhi[:, ax] >= center
        axis_l[me] = ax
        plane_l[me] = float(center)
        left_l[me] = subdivide(ids[lmask], lo, l_hi, depth + 1)
        right_l[me] = subdivide(ids[rmask], r_lo, hi, depth + 1)
        return me

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        subdivide(np.arange(n), root_lo.copy(), root_hi.copy(), 0)
    finally:
        sys.setrecursionlimit(old_limit)
    timer.mark("subdivide")

    counts = np.asarray(count_l, np.int32)
    out = BspBuffers(
        axis=np.asarray(axis_l, np.int32),
        plane=np.asarray(plane_l, np.float32),
        left=np.asarray(left_l, np.int32),
        right=np.asarray(right_l, np.int32),
        first=np.asarray(first_l, np.int32),
        count=counts,
        prim_ids=np.asarray(prim_ids, np.int32),
        bbox_lo=root_lo.astype(np.float32),
        bbox_hi=root_hi.astype(np.float32),
        max_level=max_depth,
        max_count=int(counts.max()) if counts.size else 0,
    )
    timer.mark("flatten")
    return out


def build_for_mesh(mesh, max_depth=MAX_DEPTH_DEFAULT, max_objects=MAX_OBJECTS_DEFAULT):
    lo, hi = mesh.bboxes()
    return build(lo, hi, max_depth, max_objects)


def validate(bsp: BspBuffers, num_prims: int) -> None:
    """Reference test invariants: every primitive appears in >= 1 leaf
    (bsp_tree.rs:357-392); leaf ranges are disjoint slices of prim_ids
    (:395-420)."""
    leaf = bsp.axis == NODE_LEAF
    seen = np.zeros(num_prims, bool)
    total = 0
    for i in np.nonzero(leaf)[0]:
        ids = bsp.prim_ids[bsp.first[i] : bsp.first[i] + bsp.count[i]]
        seen[ids] = True
        total += len(ids)
    assert seen.all(), "every primitive must appear in some leaf"
    assert total == len(bsp.prim_ids)
    internal = ~leaf
    assert (bsp.left[internal] >= 0).all() and (bsp.right[internal] >= 0).all()


# ---------------------------------------------------------------------------
# Device traversal
# ---------------------------------------------------------------------------

_MAX_ITERS = 4096


def _aabb_clamp(rays: Rays, lo, hi):
    """intersect_min_max (aabb.wgsl:8-31): outer-envelope interval clamp."""
    inv_d = 1.0 / rays.d
    t0 = (lo - rays.o) * inv_d
    t1 = (hi - rays.o) * inv_d
    pmin = jnp.minimum(t0, t1)
    pmax = jnp.maximum(t0, t1)
    ok = jnp.abs(rays.d) > 1.0e-8
    tmin = jnp.min(jnp.where(ok, pmin, 1e32), axis=-1)
    tmax = jnp.max(jnp.where(ok, pmax, -1e32), axis=-1)
    hit = ~((tmin > tmax) | (tmin > rays.tmax) | (tmax < rays.tmin))
    new_tmin = jnp.maximum(tmin - 1e-4, rays.tmin)
    new_tmax = jnp.minimum(tmax + 1e-4, rays.tmax)
    return (
        jnp.where(hit, new_tmin, rays.tmin),
        jnp.where(hit, new_tmax, rays.tmax),
        hit,
    )


def _traverse(rays: Rays, bsp: BspBuffers, vertices, indices, max_leaf, any_hit):
    """Shared lockstep BSP walk. Returns (t, prim) or blocked mask."""
    n = rays.o.shape[0]
    depth = bsp.max_level + 1

    tmin0, tmax0, box_hit = _aabb_clamp(rays, bsp.bbox_lo, bsp.bbox_hi)

    def leaf_test(first, count, cur_tmin, cur_tmax, best_t, best_id, active):
        # BSP leaves at the depth cap can hold arbitrarily many objects, so
        # the slot loop is a fori_loop bounded by the build-time maximum.
        def slot_body(k, carry):
            best_t, best_id, found = carry
            slot_ok = active & (k < count)
            pid = bsp.prim_ids[
                jnp.clip(first + k, 0, bsp.prim_ids.shape[0] - 1)
            ]
            tri = indices[pid]
            v0 = vertices[tri[:, 0]]
            v1 = vertices[tri[:, 1]]
            v2 = vertices[tri[:, 2]]
            sub = Rays(rays.o, rays.d, rays.tmin, best_t)
            t, _, _, ok = triangle_t(sub, v0, v1, v2)
            ok = ok & slot_ok
            best_id = jnp.where(ok & (t < best_t), pid, best_id)
            best_t = jnp.where(ok, jnp.minimum(t, best_t), best_t)
            return best_t, best_id, found | ok

        best_t, best_id, found = jax.lax.fori_loop(
            0,
            bsp.max_count,
            slot_body,
            (best_t, best_id, jnp.zeros(n, bool)),
        )
        return best_t, best_id, found

    def cond(state):
        it, cur, *_ = state
        return (it < _MAX_ITERS) & jnp.any(cur >= 0)

    def body(state):
        (it, cur, sp, st_node, st_tmin, st_tmax,
         tmin, tmax, best_t, best_id, done) = state
        active = cur >= 0
        node = jnp.clip(cur, 0, bsp.axis.shape[0] - 1)
        ax = bsp.axis[node]
        is_leaf = ax == NODE_LEAF

        do_leaf = active & is_leaf
        best_t, best_id, found = leaf_test(
            bsp.first[node], jnp.where(do_leaf, bsp.count[node], 0),
            tmin, tmax, best_t, best_id, do_leaf,
        )
        # Early-return semantics: a leaf with any hit retires the lane.
        retire = do_leaf & found
        if any_hit:
            retire = retire  # blocked as soon as found
        done = done | retire

        # Pop for non-found leaves; retire if stack empty.
        need_pop = do_leaf & ~found
        can_pop = need_pop & (sp > 0)
        sp_pop = jnp.where(can_pop, sp - 1, sp)
        row = jnp.arange(n)
        slot = jnp.clip(sp_pop, 0, depth - 1)
        popped_node = st_node[row, slot]
        popped_tmin = st_tmin[row, slot]
        popped_tmax = st_tmax[row, slot]

        # Internal node: near/far by direction sign; plane t-test.
        axc = jnp.clip(ax, 0, 2)
        d_ax = jnp.take_along_axis(rays.d, axc[:, None], axis=1)[:, 0]
        o_ax = jnp.take_along_axis(rays.o, axc[:, None], axis=1)[:, 0]
        lchild = bsp.left[node]
        rchild = bsp.right[node]
        near = jnp.where(d_ax >= 0.0, lchild, rchild)
        far = jnp.where(d_ax >= 0.0, rchild, lchild)
        denom = jnp.where(jnp.abs(d_ax) < 1e-8, 1e-8, d_ax)
        t_plane = (bsp.plane[node] - o_ax) / denom

        go_near = t_plane > tmax
        go_far = t_plane < tmin
        split = ~go_near & ~go_far  # push far, shrink tmax, go near

        descend = active & ~is_leaf
        push = descend & split & (sp < depth)
        slot_push = jnp.clip(sp, 0, depth - 1)
        old_n = st_node[row, slot_push]
        old_a = st_tmin[row, slot_push]
        old_b = st_tmax[row, slot_push]
        st_node = st_node.at[row, slot_push].set(jnp.where(push, far, old_n))
        st_tmin = st_tmin.at[row, slot_push].set(jnp.where(push, t_plane, old_a))
        st_tmax = st_tmax.at[row, slot_push].set(jnp.where(push, tmax, old_b))
        sp_new = jnp.where(push, sp + 1, sp)

        next_internal = jnp.where(go_far, far, near)  # near covers both
        new_tmax = jnp.where(push, t_plane, tmax)

        cur_next = jnp.where(
            descend,
            next_internal,
            jnp.where(can_pop, popped_node, -1),
        )
        cur_next = jnp.where(retire, -1, cur_next)
        tmin_next = jnp.where(can_pop & ~descend, popped_tmin, tmin)
        tmax_next = jnp.where(
            descend, new_tmax, jnp.where(can_pop, popped_tmax, tmax)
        )
        sp_next = jnp.where(descend, sp_new, sp_pop)
        return (
            it + 1, cur_next, sp_next, st_node, st_tmin, st_tmax,
            tmin_next, tmax_next, best_t, best_id, done,
        )

    state = (
        jnp.int32(0),
        jnp.where(box_hit, 0, -1).astype(jnp.int32),
        jnp.zeros(n, jnp.int32),
        jnp.zeros((n, depth), jnp.int32),
        jnp.zeros((n, depth), jnp.float32),
        jnp.zeros((n, depth), jnp.float32),
        tmin0,
        tmax0,
        rays.tmax,
        jnp.full(n, -1, jnp.int32),
        jnp.zeros(n, bool),
    )
    out = jax.lax.while_loop(cond, body, state)
    best_t, best_id = out[8], out[9]
    # Loud truncation (same contract as flat/packet/wide): a lane still
    # active when the iteration cap tripped has an untrustworthy result.
    conv = out[1] < 0
    if any_hit:
        return best_id >= 0, conv
    return best_t, best_id, conv


CHUNK = 16384  # wavefront chunk: lax.map retires chunks independently, so
# a chunk's worst lane bounds only its own 16k rays, not the whole frame


def _chunked(rays: Rays, fn):
    n = rays.o.shape[0]
    if n <= CHUNK:
        return fn(rays)
    pad = (-n) % CHUNK
    c = (n + pad) // CHUNK

    def padded(x, fill):
        if x.ndim == 1:
            x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
            return x.reshape(c, CHUNK)
        x = jnp.concatenate([x, jnp.full((pad, x.shape[1]), fill, x.dtype)])
        return x.reshape(c, CHUNK, x.shape[1])

    # Padding rays: empty [tmin, tmax) window; the root test fails and the
    # lane retires on the first step.
    chunks = Rays(
        o=padded(rays.o, 1.0e30),
        d=padded(rays.d, 1.0),
        tmin=padded(rays.tmin, 1.0),
        tmax=padded(rays.tmax, 0.0),
    )
    out = jax.lax.map(fn, chunks)
    return jax.tree.map(lambda x: x.reshape(-1)[:n], out)


def bsp_closest_hit(rays: Rays, bsp: BspBuffers, vertices, indices,
                    max_leaf: int = 8, with_conv: bool = False):
    """First-leaf-hit traversal (``intersect_trimesh``).

    ``with_conv=True`` additionally returns a per-lane bool, False where
    the _MAX_ITERS cap truncated the walk (the reference hangs the GPU on
    traversal overflow, bvh.wgsl:139-148; we flag instead)."""
    t, pid, conv = _chunked(
        rays,
        lambda r: _traverse(r, bsp, vertices, indices, max_leaf, any_hit=False),
    )
    if with_conv:
        return t, pid, conv
    return t, pid


def bsp_any_hit(rays: Rays, bsp: BspBuffers, vertices, indices,
                max_leaf: int = 8, with_conv: bool = False):
    """Occlusion traversal (``intersect_trimesh_immediate_return``)."""
    blocked, conv = _chunked(
        rays,
        lambda r: _traverse(r, bsp, vertices, indices, max_leaf, any_hit=True),
    )
    if with_conv:
        return blocked, conv
    return blocked
