"""TPU-native acceleration-structure traversal megakernel (v5).

The reference's perf centerpiece is per-ray KD-tree stack traversal in
the device hot loop (MCRT/QuinEngine/Shader/rtx.hlsl:144-211, builder
Utils/KDTree.hpp:55-402): each GPU thread walks its own node stack and
tests ≤64-triangle leaves front-to-back. That shape is wrong for a
128-lane SIMD machine — per-lane stacks mean per-lane control flow and
scattered leaf gathers.

This kernel is the TPU-shaped equivalent, built on three observations:

1. With Morton-ordered triangles, fixed chunks have tight AABBs — a
   chunk is the TPU analog of a KD leaf, and an MXU contraction over it
   is cheaper than any per-lane pruning *of* it.
2. With Morton-sorted rays (ops.intersect_pallas.ray_sort_keys), a
   kernel ray tile is spatially/directionally coherent — so traversal
   decisions can be made ONCE PER TILE (scalar control flow) instead of
   once per ray (lane divergence). The tile, not the ray, is the
   traversal agent.
3. The v4 streamed megakernel is DMA-bound at scene scale: every ray
   tile re-streams every packed triangle chunk each segment (82k-tri
   bunny: ~32 MB × ~1000 tiles × 8 segments per 1-spp pass). Culling
   compute under `pl.when` does not help — the automatic pipeline
   still fetches every block. Beating it requires skipping the DMA
   itself, which means *manual* double-buffered DMA.

Per (ray tile, path segment) the traversal is:

- HOST (XLA, vectorized over all tiles × chunks, no kernel): conservative
  per-tile frustum test — tile origin AABB + per-axis direction sign
  bounds vs chunk AABB — and a front-to-back ordering of the surviving
  chunks by the Euclidean origin-box→chunk-box distance (a lower bound
  on hit t for unit-speed rays). Yields ``order``/``tmin``/``n_reach``
  per tile: the tile's personal traversal list.
- KERNEL (one grid step per tile): walk the list with manually
  double-buffered HBM→VMEM DMA. Per visited chunk: per-lane slab test
  against the *current* best-t (skips compute), the K-packed exact
  contraction + division-free accept, best-(t, index) update, then an
  early-exit check — because the list is sorted by ``tmin`` and
  ``tmin`` lower-bounds any hit in the remaining chunks, the walk
  stops as soon as every live lane's best-t is below the next chunk's
  ``tmin``. Stopping means the remaining chunks are neither computed
  NOR FETCHED — the O(log)-ish work profile of tree traversal, with
  none of its divergence.
- EPILOGUE (XLA): the kernel is SELECTION-ONLY — it returns the winner
  index per lane; exact f32 (t, β, γ) and the 48-value geometry+shading
  row come from ONE full-width row gather + Cramer recompute
  (`intersect_pallas._recompute_winner`). v4 moved this into the kernel
  as a per-chunk one-hot matmul to avoid gathers, which is the right
  call in the resident/streamed regime (every chunk visited once per
  tile anyway) — but a traversal walk visits ~10% of chunks and pays
  the winner machinery per VISIT, while the epilogue pays one gather
  per RAY per segment (~10 ms at 480k rays in the full-row form).
  Selection-only also halves the walk's DMA (no rows stream) and makes
  differentiation free: the index is piecewise-constant (stop_gradient)
  and AD flows through the recompute — no custom_vjp needed.

Correctness does not depend on the frustum/ordering heuristics: a
chunk is only skipped when NO ray in the tile can produce a nearer
accepted hit in it (conservative interval tests + the sorted-tmin
bound). Accept math is identical to `nearest_shade_full`; like every
cull-family kernel, returned triangle indices live in the
Morton-permuted order and exact-t ties between triangles in
*different* chunks may resolve differently per tile (measure-zero;
shared mesh edges are rejected by the open β/γ tests on both sides).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_pallas import (
    _BIG,
    _RAY_TILE,
    _recompute_winner,
    _sds,
    _split_cat,
    _soa_rays,
)


def tile_chunk_order(
    pos3: jnp.ndarray,  # f32[3, Rp] (Rp = ntiles·ray_tile)
    dir3: jnp.ndarray,  # f32[3, Rp] unit
    live: jnp.ndarray,  # f32[1, Rp] (>0 = live)
    clo: jnp.ndarray,  # f32[nc, 3] chunk AABB lows
    chi: jnp.ndarray,  # f32[nc, 3] chunk AABB highs
    ray_tile: int,
    lane_group: int = 0,
):
    """Per-tile front-to-back chunk traversal lists (host/XLA side).

    Returns ``(order i32[ntiles8, nc], tmins f32[ntiles8, nc],
    gmask i32[ntiles8, nc], n_reach i32[ntiles8, 1])`` with the tile
    axis padded to a multiple of 8 (the kernel reads them through
    (8, nc) SMEM blocks).

    The frustum test runs per LANE GROUP (``lane_group`` lanes; the
    kernel's compute-gating granularity) rather than per tile — r5:
    on a sorted bounce wavefront a 2048-ray tile spans several origin
    cells with mixed direction octants, so its per-tile direction
    bounds admit every axis and the tile-level frustum prunes almost
    nothing (the measured ~75%-of-chunks bounce visit rate, PERF.md
    r4). Group frustums are tight (the sort key clusters origin AND
    direction), and:

    - a chunk enters the tile's walk list only if SOME group reaches
      it — ``n_reach`` shrinks, which cuts visits AND their DMA;
    - ``gmask`` bit g tells the kernel that group g's host frustum
      reaches the chunk, so non-reaching groups skip their MXU/VPU
      work without consulting the runtime slab test. Conservative
      (interval test over the group's live rays), so results stay
      bit-identical.

    - reach: chunk survives iff for every axis on which the chunk box
      is strictly disjoint from the group's live-ray origin box, some
      live ray's direction component points toward it (conservative —
      never excludes a reachable chunk).
    - tmin: Euclidean distance between origin box and chunk box — a
      lower bound on the ray parameter t of ANY hit inside the chunk
      for unit-length directions (min over reaching groups), which is
      what makes the kernel's early exit sound.
    """
    Rp = pos3.shape[1]
    ntiles = Rp // ray_tile
    nc = clo.shape[0]
    lg = lane_group if lane_group else ray_tile
    ng = ray_tile // lg
    if ng * lg != ray_tile or ng > 32:
        raise ValueError(
            f"lane_group {lane_group} must divide ray_tile {ray_tile} "
            f"into at most 32 groups (the per-chunk reach bitmask is "
            f"an i32); got {ng} groups"
        )
    nt_g = ntiles * ng
    lv = (live.reshape(nt_g, lg) > 0.0)[:, None, :]  # [ntg,1,lg]
    p = pos3.reshape(3, nt_g, lg).transpose(1, 0, 2)  # [ntg,3,lg]
    d = dir3.reshape(3, nt_g, lg).transpose(1, 0, 2)
    big = jnp.float32(_BIG)
    olo = jnp.min(jnp.where(lv, p, big), axis=2)  # [ntg, 3]
    ohi = jnp.max(jnp.where(lv, p, -big), axis=2)
    dlo = jnp.min(jnp.where(lv, d, big), axis=2)
    dhi = jnp.max(jnp.where(lv, d, -big), axis=2)
    any_live = lv.any(axis=2)  # [ntg, 1]

    # [ntg, nc, 3] gaps: chunk strictly above / below the origin box.
    g_hi = clo[None, :, :] - ohi[:, None, :]
    g_lo = olo[:, None, :] - chi[None, :, :]
    # Axis reachable unless the chunk is strictly on one side and no
    # live direction component points that way.
    ax_ok = ~(
        ((g_hi > 0.0) & (dhi[:, None, :] <= 0.0))
        | ((g_lo > 0.0) & (dlo[:, None, :] >= 0.0))
    )
    reach_g = (ax_ok.all(axis=2) & any_live).reshape(ntiles, ng, nc)
    gap = jnp.maximum(jnp.maximum(g_hi, g_lo), 0.0)
    tmin_g = jnp.sqrt(jnp.sum(gap * gap, axis=2)).reshape(
        ntiles, ng, nc
    )

    reach = reach_g.any(axis=1)  # [nt, nc]
    tmin = jnp.min(jnp.where(reach_g, tmin_g, big), axis=1)
    bits = jnp.left_shift(
        jnp.ones((ng,), jnp.int32), jnp.arange(ng, dtype=jnp.int32)
    )
    gmask_c = jnp.sum(
        jnp.where(reach_g, bits[None, :, None], 0), axis=1,
        dtype=jnp.int32,
    )  # [nt, nc]

    key = jnp.where(reach, tmin, big)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    tmins = jnp.take_along_axis(key, order, axis=1)
    gmask = jnp.take_along_axis(gmask_c, order, axis=1)
    n_reach = reach.sum(axis=1, dtype=jnp.int32)[:, None]

    pad8 = (-ntiles) % 8
    if pad8:
        order = jnp.concatenate(
            [order, jnp.zeros((pad8, nc), jnp.int32)], axis=0
        )
        tmins = jnp.concatenate(
            [tmins, jnp.full((pad8, nc), big)], axis=0
        )
        gmask = jnp.concatenate(
            [gmask, jnp.zeros((pad8, nc), jnp.int32)], axis=0
        )
        n_reach = jnp.concatenate(
            [n_reach, jnp.zeros((pad8, 1), jnp.int32)], axis=0
        )
    return order, tmins, gmask, n_reach


def _traverse_kernel(
    nr_ref,  # SMEM (8, 1) i32: n_reach rows for this 8-tile group
    ord_ref,  # SMEM (8, nc) i32: per-tile chunk order
    tmin_ref,  # SMEM (8, nc) f32: sorted chunk-distance lower bounds
    gm_ref,  # SMEM (8, nc) i32: per-chunk lane-group reach bitmask
    rays_ref,  # VMEM (8, Rt) f32 [o | 1 | d | 0]
    live_ref,  # VMEM (1, Rt) f32
    ws_ref,  # ANY (8, T_pad·6) f32 — streamed transform chunks
    clo_ref,  # SMEM (nc, 3) f32 chunk AABB lows
    chi_ref,  # SMEM (nc, 3) f32 chunk AABB highs
    idx_ref,  # out VMEM (1, Rt) i32 — winner index (selection only)
    rk_ref,  # scratch VMEM (K, Rt) bf16 packed rays
    ws_buf,  # scratch VMEM (2, 8, 6·tc) f32
    bt_ref,  # scratch VMEM (1, Rt) f32 best t
    bi_ref,  # scratch VMEM (1, Rt) i32 best index
    sem_ws,  # DMA((2,))
    *,
    t_chunk: int,
    exact: bool,
    terms: int = 3,
    lane_group: int = 0,
    walk_unroll: int = 1,
):
    tc = t_chunk
    nc = ord_ref.shape[1]
    Rt = rays_ref.shape[1]
    D = ws_buf.shape[0]  # DMA pipeline depth (outstanding copies)
    row = jax.lax.rem(pl.program_id(0), 8)
    n0 = nr_ref[row, 0]

    rays = rays_ref[:]  # (8, Rt) f32
    rk_ref[:] = (
        _split_cat(rays, 0, "hlhl", terms)
        if exact
        else rays.astype(jnp.bfloat16)
    )
    live = live_ref[0, :] > 0.0
    bt_ref[0, :] = jnp.full((Rt,), _BIG, jnp.float32)
    bi_ref[0, :] = jnp.full((Rt,), 2**31 - 1, jnp.int32)

    def ws_dma(slot, j):
        return pltpu.make_async_copy(
            ws_ref.at[:, pl.ds(j * 6 * tc, 6 * tc)],
            ws_buf.at[slot],
            sem_ws.at[slot],
        )

    def ord_at(p):
        # Clamped traversal-list read: positions past the list's end
        # re-fetch the last chunk. This makes EVERY DMA unconditional —
        # each loop iteration waits one slot and prefetches one slot,
        # so exactly D copies are outstanding at every loop boundary
        # on every control path (drained by the D waits at the end).
        # A clamped prefetch is a harmless over-read per tile;
        # conditional starts, by contrast, are both a deadlock risk
        # (semaphore imbalance leaks into later grid steps) and
        # unsupported by the interpreter's DMA emulation.
        return ord_ref[row, jnp.minimum(p, nc - 1)]

    for i in range(D):
        ws_dma(i, ord_at(i)).start()

    def reach_lanes(j, tmax):
        """Per-lane segment-vs-AABB slab test for chunk j (f32 VPU)."""
        tn = jnp.full((Rt,), -_BIG, jnp.float32)
        tf = jnp.full((Rt,), _BIG, jnp.float32)
        for k in range(3):
            o_k = rays[k]
            d_k = rays[4 + k]
            lo = clo_ref[j, k]
            hi = chi_ref[j, k]
            zero = jnp.abs(d_k) < 1e-12
            inv = 1.0 / jnp.where(zero, 1.0, d_k)
            t0 = (lo - o_k) * inv
            t1 = (hi - o_k) * inv
            inside = (o_k >= lo) & (o_k <= hi)
            tn = jnp.maximum(
                tn,
                jnp.where(
                    zero,
                    jnp.where(inside, -_BIG, _BIG),
                    jnp.minimum(t0, t1),
                ),
            )
            tf = jnp.minimum(
                tf,
                jnp.where(
                    zero,
                    jnp.where(inside, _BIG, -_BIG),
                    jnp.maximum(t0, t1),
                ),
            )
        return (tn <= tf) & (tf >= 0.0) & (tn < tmax) & live

    def accept_cols(p, j, c0, cw):
        """Division-free accept + best-(t, index) update for lane
        columns [c0, c0+cw) given their contraction ``p`` (6·tc, cw)."""
        sl = pl.ds(c0, cw)
        opx = p[0 * tc : 1 * tc]
        opy = p[1 * tc : 2 * tc]
        q = p[2 * tc : 3 * tc]  # −o'z (negated at pack time)
        dpx = p[3 * tc : 4 * tc]
        dpy = p[4 * tc : 5 * tc]
        w = p[5 * tc : 6 * tc]  # d'z
        r = pl.reciprocal(w, approx=True)
        r = r * (2.0 - w * r)  # one Newton step → ~1 ulp
        t = q * r
        beta = opx + t * dpx
        gamma = opy + t * dpy
        mm = jnp.minimum(jnp.minimum(beta, gamma), t)
        mm = jnp.minimum(mm, 1.0 - (beta + gamma))
        tm = jnp.where(mm > 0.0, t, _BIG)
        c_min = jnp.min(tm, axis=0)  # (cw,)
        col = jax.lax.broadcasted_iota(jnp.int32, (tc, cw), 0)
        c_idx = jnp.min(
            jnp.where(tm <= c_min[None, :], col, jnp.int32(2**31 - 1)),
            axis=0,
        )
        bt = bt_ref[0, sl]
        better = c_min < bt
        bt_ref[0, sl] = jnp.where(better, c_min, bt)
        bi_ref[0, sl] = jnp.where(better, c_idx + j * tc, bi_ref[0, sl])

    def compute_chunk(slot, j, gm, reach):
        """Selection-only chunk body: K-packed contraction + accept,
        gated per ``lane_group``-wide column group.

        Lane-group gating (r4): on incoherent bounce wavefronts a tile
        visits most chunks but only ~20% of its lanes can reach each
        one — and the sort clusters reaching lanes, so whole column
        groups are skippable. Gating the contraction + accept per
        group cuts the dominant per-visit MXU/VPU work; the per-lane
        ``reach`` bound makes skipping exact (a lane whose segment
        cannot enter the chunk's AABB below its best-t cannot improve
        there), so results are bit-identical to the ungated kernel.
        r5 adds the host-side group-frustum bit (``gm`` bit g, see
        `tile_chunk_order`) as a second conservative gate ANDed in.
        """
        ws_blk = ws_buf[slot]  # (8, 6·tc) f32
        w_k = (
            _split_cat(ws_blk, 0, "hhll", terms)
            if exact
            else ws_blk.astype(jnp.bfloat16)
        )
        lg = lane_group if lane_group else Rt
        for g in range(Rt // lg):
            def run_group(g=g):
                p = jax.lax.dot_general(
                    w_k,
                    rk_ref[:, pl.ds(g * lg, lg)],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (6·tc, lg)
                accept_cols(p, j, g * lg, lg)

            if lane_group:
                gbit = jax.lax.shift_right_logical(gm, g) & 1
                pl.when(
                    (gbit > 0)
                    & jnp.any(reach[g * lg : (g + 1) * lg])
                )(run_group)
            else:
                run_group()

    def one_pos(p, n_stop):
        """Visit list position p: wait its slot, compute if the
        position is still inside the (possibly tightened) stop bound
        and any lane reaches, update the early-exit bound, prefetch
        p+D. DMA wait/start are unconditional — semaphore accounting
        must match on every control path."""
        slot = jax.lax.rem(p, D)
        j = ord_at(p)
        gm = gm_ref[row, jnp.minimum(p, nc - 1)]
        ws_dma(slot, j).wait()

        reach = reach_lanes(j, bt_ref[0, :])
        do = jnp.any(reach) & (p < n_stop)
        jax.lax.cond(
            do, lambda: compute_chunk(slot, j, gm, reach), lambda: None
        )

        # Early exit: tmin is sorted ascending, so once the NEXT
        # chunk's distance bound exceeds every live lane's best-t, no
        # remaining chunk can improve any lane — stop walking (the
        # in-flight prefetches are drained below). The bound is slack
        # by ~1 ulp of relative error: tmin lower-bounds hit t only for
        # exactly unit-length directions, and bounce directions carry
        # ~1e-7 normalization error (ADVICE r3) — the (1 + 1e-6) factor
        # absorbs it so a marginally-nearer hit can never be skipped.
        bt_max = jnp.max(jnp.where(live, bt_ref[0, :], 0.0))
        bt_bound = bt_max * (1.0 + 1e-6) + 1e-6
        nxt = jnp.minimum(p + 1, nc - 1)
        n_stop = jnp.where(
            (p + 1 < n_stop) & (tmin_ref[row, nxt] > bt_bound),
            p + 1,
            n_stop,
        )

        ws_dma(slot, ord_at(p + D)).start()  # unconditional prefetch
        return n_stop

    def body(carry):
        # walk_unroll > 1 amortizes the while_loop's per-iteration
        # scalar/carry overhead over several visits; the (p < n_stop)
        # compute gate keeps the visit set EXACTLY the unrolled-1 set
        # (positions past a freshly tightened bound wait/prefetch but
        # never compute), so results are bit-identical for any unroll.
        p, n_stop = carry
        for u in range(walk_unroll):
            n_stop = one_pos(p + u, n_stop)
        return (p + walk_unroll, n_stop)

    p_end, _ = jax.lax.while_loop(
        lambda c: c[0] < c[1], body, (jnp.int32(0), n0)
    )

    # Drain the D outstanding prefetches (positions p_end..p_end+D-1 —
    # possibly clamped duplicates; the waits match by copy size).
    for i in range(D):
        ws_dma(jax.lax.rem(p_end + i, D), ord_at(p_end + i)).wait()

    idx_ref[0, :] = jnp.where(
        bt_ref[0, :] < _BIG, bi_ref[0, :], jnp.int32(-1)
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "ray_tile", "t_chunk", "interpret", "exact", "terms",
        "lane_group", "dma_depth", "walk_unroll",
    ),
)
def traverse_select(
    ws: jnp.ndarray,  # f32[8, T_pad*6] (pack_transforms_stream, Morton)
    clo: jnp.ndarray,  # f32[nc, 3] chunk AABB lows (same order)
    chi: jnp.ndarray,  # f32[nc, 3] chunk AABB highs
    pos3: jnp.ndarray,  # f32[3, R]
    dir3: jnp.ndarray,  # f32[3, R] unit
    live: jnp.ndarray = None,  # bool/f32[R]; None = all live
    *,
    ray_tile: int = _RAY_TILE,
    t_chunk: int = 128,
    interpret: bool = False,
    exact: bool = True,
    terms: int = 3,
    lane_group: int = 0,
    dma_depth: int = 4,
    walk_unroll: int = 1,
) -> jnp.ndarray:
    """Selection-only traversal walk: winner index i32[R] (−1 = miss),
    in the caller's (Morton-permuted) triangle order.

    SMEM bounds the chunk count: order+tmin (8·nc·8 B) + boxes
    (nc·24 B) ⇒ ~1M triangles at tc=128; coarsen ``t_chunk`` beyond
    that.
    """
    R = pos3.shape[1]
    K_T6 = ws.shape[1]
    assert K_T6 % (6 * t_chunk) == 0, (K_T6, t_chunk)
    if lane_group and ray_tile % lane_group:
        # A non-divisor would leave the tail lanes of every tile
        # untested against any chunk (ADVICE r4).
        raise ValueError(
            f"lane_group {lane_group} must divide ray_tile {ray_tile}"
        )
    nc = K_T6 // (6 * t_chunk)
    assert clo.shape == (nc, 3) and chi.shape == (nc, 3), (clo.shape, nc)
    if live is None:
        live = jnp.ones((R,), jnp.float32)
    live_f = live.astype(jnp.float32).reshape(1, -1)
    pad = (-R) % ray_tile
    if pad:
        pos3 = jnp.concatenate(
            [pos3, jnp.zeros((3, pad), pos3.dtype)], axis=1
        )
        dir3 = jnp.concatenate(
            [dir3, jnp.zeros((3, pad), dir3.dtype)], axis=1
        )
        live_f = jnp.concatenate(
            [live_f, jnp.zeros((1, pad), jnp.float32)], axis=1
        )
    Rp = R + pad
    ntiles = Rp // ray_tile
    rays = _soa_rays(pos3, dir3, Rp)

    order, tmins, gmask, n_reach = tile_chunk_order(
        pos3, dir3, live_f, clo, chi, ray_tile, lane_group
    )

    K = (48 if terms == 3 else 24) if exact else 8
    idx = pl.pallas_call(
        functools.partial(
            _traverse_kernel, t_chunk=t_chunk, exact=exact, terms=terms,
            lane_group=lane_group, walk_unroll=walk_unroll,
        ),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(
                (8, 1), lambda i: (i // 8, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (8, nc), lambda i: (i // 8, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (8, nc), lambda i: (i // 8, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (8, nc), lambda i: (i // 8, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (8, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # ws (stays in HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # clo
            pl.BlockSpec(memory_space=pltpu.SMEM),  # chi
        ],
        out_specs=pl.BlockSpec(
            (1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=_sds((1, Rp), jnp.int32, rays),
        scratch_shapes=[
            pltpu.VMEM((K, ray_tile), jnp.bfloat16),  # packed rays
            # ws prefetch ring: dma_depth outstanding copies — with
            # only 2, each ~100 KB chunk copy's issue-to-complete
            # latency stalls the walk when per-chunk compute is short
            # (gated bounce visits), making the loop latency-bound.
            pltpu.VMEM((dma_depth, 8, 6 * t_chunk), jnp.float32),
            pltpu.VMEM((1, ray_tile), jnp.float32),  # best t
            pltpu.VMEM((1, ray_tile), jnp.int32),  # best index
            pltpu.SemaphoreType.DMA((dma_depth,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(n_reach, order, tmins, gmask, rays, live_f, ws, clo, chi)
    return idx[0, :R]


def nearest_shade_traverse(
    ws, rows, clo, chi, pos3, dir3, live=None, *,
    ray_tile: int = _RAY_TILE, t_chunk: int = 128,
    interpret: bool = False, exact: bool = True, terms: int = 3,
    lane_group: int = 0,
):
    """Traversal intersector: selection walk + differentiable epilogue.

    ``rows`` is the (T_pad, 48) `pack_rows_full` table (same Morton
    order as ``ws``). Returns (idx i32[R], tbg f32[4, R], shade
    f32[32, R]) — the same contract as `nearest_shade_full`. Gradients
    w.r.t. the rows (→ vertices/normals/materials) and the ray
    origin/direction flow through `_recompute_winner`'s full-row gather
    + Cramer recompute; the argmin index is piecewise-constant and
    detached — no custom_vjp needed.
    """
    idx = jax.lax.stop_gradient(
        traverse_select(
            jax.lax.stop_gradient(ws),
            jax.lax.stop_gradient(clo),
            jax.lax.stop_gradient(chi),
            jax.lax.stop_gradient(pos3),
            jax.lax.stop_gradient(dir3),
            None if live is None else jax.lax.stop_gradient(live),
            ray_tile=ray_tile, t_chunk=t_chunk,
            interpret=interpret, exact=exact, terms=terms,
            lane_group=lane_group,
        )
    )
    tbg, shade = _recompute_winner(rows, idx, pos3, dir3, interpret)
    return idx, tbg, shade


# The selection-only design is differentiable as-is; keep the old name
# as an alias so callers don't need to distinguish.
nearest_shade_traverse_diff = nearest_shade_traverse
