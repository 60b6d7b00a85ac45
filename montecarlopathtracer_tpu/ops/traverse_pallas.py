"""TPU-native acceleration-structure traversal megakernel (v5).

The reference's perf centerpiece is per-ray KD-tree stack traversal in
the device hot loop (MCRT/QuinEngine/Shader/rtx.hlsl:144-211, builder
Utils/KDTree.hpp:55-402): each GPU thread walks its own node stack and
tests ≤64-triangle leaves front-to-back. That shape is wrong for a
128-lane SIMD machine — per-lane stacks mean per-lane control flow and
scattered leaf gathers.

This kernel is the TPU-shaped equivalent, built on three observations:

1. With Morton-ordered triangles, fixed 128-triangle chunks have tight
   AABBs — a chunk is the TPU analog of a KD leaf, and an MXU
   contraction over it is cheaper than any per-lane pruning *of* it.
2. With Morton-sorted rays (ops.intersect_pallas.ray_sort_keys), a
   512-ray kernel tile is spatially/directionally coherent — so
   traversal decisions can be made ONCE PER TILE (scalar control flow)
   instead of once per ray (lane divergence). The tile, not the ray, is
   the traversal agent.
3. The v4 streamed megakernel is DMA-bound at scene scale: every ray
   tile re-streams every packed triangle chunk each segment (82k-tri
   bunny: ~32 MB × ~2000 tiles × 8 segments per 1-spp pass). Culling
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
  against the *current* best-t (skips compute), the v4 chunk body
  (K-packed exact contraction, division-free accept, one-hot winner
  row fetch), then an early-exit check — because the list is sorted by
  ``tmin`` and ``tmin`` lower-bounds any hit in the remaining chunks,
  the walk stops as soon as every live lane's best-t is below the next
  chunk's ``tmin``. Stopping means the remaining chunks are neither
  computed NOR FETCHED — the O(log)-ish work profile of tree
  traversal, with none of its divergence.

Correctness does not depend on the frustum/ordering heuristics: a
chunk is only skipped when NO ray in the tile can produce a nearer
accepted hit in it (conservative interval tests + the sorted-tmin
bound). Output contract and accept math are identical to
`nearest_shade_full` (v4); like every cull-family kernel, returned
triangle indices live in the Morton-permuted order and exact-t ties
between triangles in *different* chunks may resolve differently per
tile (measure-zero; shared mesh edges are rejected by the open β/γ
tests on both sides).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_pallas import (
    _BIG,
    _sds,
    _RAY_TILE,
    _bf16_split3,
    _recompute_winner,
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
):
    """Per-tile front-to-back chunk traversal lists (host/XLA side).

    Returns ``(order i32[ntiles8, nc], tmins f32[ntiles8, nc],
    n_reach i32[ntiles8, 1])`` with the tile axis padded to a multiple
    of 8 (the kernel reads them through (8, nc) SMEM blocks).

    - reach: chunk survives iff for every axis on which the chunk box
      is strictly disjoint from the tile's live-ray origin box, some
      live ray's direction component points toward it (conservative
      interval test — never excludes a reachable chunk).
    - tmin: Euclidean distance between the two boxes — a lower bound on
      the ray parameter t of ANY hit inside the chunk for unit-length
      directions, which is what makes the kernel's early exit sound.
    """
    Rp = pos3.shape[1]
    ntiles = Rp // ray_tile
    nc = clo.shape[0]
    lv = (live.reshape(ntiles, ray_tile) > 0.0)[:, None, :]  # [nt,1,rt]
    p = pos3.reshape(3, ntiles, ray_tile).transpose(1, 0, 2)  # [nt,3,rt]
    d = dir3.reshape(3, ntiles, ray_tile).transpose(1, 0, 2)
    big = jnp.float32(_BIG)
    olo = jnp.min(jnp.where(lv, p, big), axis=2)  # [nt, 3]
    ohi = jnp.max(jnp.where(lv, p, -big), axis=2)
    dlo = jnp.min(jnp.where(lv, d, big), axis=2)
    dhi = jnp.max(jnp.where(lv, d, -big), axis=2)
    any_live = lv.any(axis=2)  # [nt, 1]

    # [nt, nc, 3] gaps: chunk strictly above / below the origin box.
    g_hi = clo[None, :, :] - ohi[:, None, :]
    g_lo = olo[:, None, :] - chi[None, :, :]
    # Axis reachable unless the chunk is strictly on one side and no
    # live direction component points that way.
    ax_ok = ~(
        ((g_hi > 0.0) & (dhi[:, None, :] <= 0.0))
        | ((g_lo > 0.0) & (dlo[:, None, :] >= 0.0))
    )
    reach = ax_ok.all(axis=2) & any_live  # [nt, nc]
    gap = jnp.maximum(jnp.maximum(g_hi, g_lo), 0.0)
    tmin = jnp.sqrt(jnp.sum(gap * gap, axis=2))  # [nt, nc]

    key = jnp.where(reach, tmin, big)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    tmins = jnp.take_along_axis(key, order, axis=1)
    n_reach = reach.sum(axis=1, dtype=jnp.int32)[:, None]

    pad8 = (-ntiles) % 8
    if pad8:
        order = jnp.concatenate(
            [order, jnp.zeros((pad8, nc), jnp.int32)], axis=0
        )
        tmins = jnp.concatenate(
            [tmins, jnp.full((pad8, nc), big)], axis=0
        )
        n_reach = jnp.concatenate(
            [n_reach, jnp.zeros((pad8, 1), jnp.int32)], axis=0
        )
    return order, tmins, n_reach


def _traverse_kernel(
    nr_ref,  # SMEM (8, 1) i32: n_reach rows for this 8-tile group
    ord_ref,  # SMEM (8, nc) i32: per-tile chunk order
    tmin_ref,  # SMEM (8, nc) f32: sorted chunk-distance lower bounds
    rays_ref,  # VMEM (8, Rt) f32 [o | 1 | d | 0]
    live_ref,  # VMEM (1, Rt) f32
    ws_ref,  # ANY (8, T_pad·6) f32 — streamed transform chunks
    rows_ref,  # ANY (48, T_pad) f32 — rows TRANSPOSED: chunk slices run
    # along the 128-lane axis (Mosaic requires 128-aligned DMA slices;
    # a (tc, 48) slice of the v4 layout is lane-misaligned)
    clo_ref,  # SMEM (nc, 3) f32 chunk AABB lows
    chi_ref,  # SMEM (nc, 3) f32 chunk AABB highs
    idx_ref,  # out VMEM (1, Rt) i32
    tbg_ref,  # out VMEM (4, Rt) f32
    shade_ref,  # out VMEM (32, Rt) f32
    rk_ref,  # scratch VMEM (K, Rt) bf16 packed rays
    ws_buf,  # scratch VMEM (2, 8, 6·tc) f32
    rows_buf,  # scratch VMEM (2, tc, 48) f32
    bt_ref,  # scratch VMEM (1, Rt) f32 best t
    bi_ref,  # scratch VMEM (1, Rt) i32 best index
    bb_ref,  # scratch VMEM (1, Rt) f32 best beta
    bg_ref,  # scratch VMEM (1, Rt) f32 best gamma
    brow_ref,  # scratch VMEM (48, Rt) f32 best row
    sem_ws,  # DMA((2,))
    sem_rows,  # DMA((2,))
    *,
    t_chunk: int,
    exact: bool,
    terms: int = 3,
):
    tc = t_chunk
    nc = ord_ref.shape[1]
    Rt = rays_ref.shape[1]
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
    bb_ref[0, :] = jnp.zeros((Rt,), jnp.float32)
    bg_ref[0, :] = jnp.zeros((Rt,), jnp.float32)
    brow_ref[:] = jnp.zeros_like(brow_ref)

    def ws_dma(slot, j):
        return pltpu.make_async_copy(
            ws_ref.at[:, pl.ds(j * 6 * tc, 6 * tc)],
            ws_buf.at[slot],
            sem_ws.at[slot],
        )

    def rows_dma(slot, j):
        return pltpu.make_async_copy(
            rows_ref.at[:, pl.ds(j * tc, tc)],
            rows_buf.at[slot],
            sem_rows.at[slot],
        )

    def issue(slot, j):
        ws_dma(slot, j).start()
        rows_dma(slot, j).start()

    def ord_at(p):
        # Clamped traversal-list read: positions past the list's end
        # re-fetch the last chunk. This makes EVERY DMA unconditional —
        # each loop iteration waits one slot and prefetches one slot,
        # so exactly two copies are outstanding at every loop boundary
        # on every control path (drained by the two waits at the end).
        # A clamped prefetch is a harmless ~100 KB over-read per tile;
        # conditional starts, by contrast, are both a deadlock risk
        # (semaphore imbalance leaks into later grid steps) and
        # unsupported by the interpreter's DMA emulation.
        return ord_ref[row, jnp.minimum(p, nc - 1)]

    issue(0, ord_at(0))
    issue(1, ord_at(1))

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

    def compute_chunk(slot, j):
        """The v4 chunk body against the slot's VMEM buffers."""
        ws_blk = ws_buf[slot]  # (8, 6·tc) f32
        w_k = (
            _split_cat(ws_blk, 0, "hhll", terms)
            if exact
            else ws_blk.astype(jnp.bfloat16)
        )
        p = jax.lax.dot_general(
            w_k,
            rk_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (6·tc, Rt)
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
        c_min = jnp.min(tm, axis=0)  # (Rt,)
        col = jax.lax.broadcasted_iota(jnp.int32, (tc, Rt), 0)
        c_idx = jnp.min(
            jnp.where(tm <= c_min[None, :], col, jnp.int32(2**31 - 1)),
            axis=0,
        )
        better = c_min < bt_ref[0, :]
        win = (col == c_idx[None, :]) & better[None, :]
        rows_blk = rows_buf[slot]  # (48, tc) f32 (transposed layout)
        onehot = win.astype(jnp.bfloat16)
        if exact:
            h, l1, l2 = _bf16_split3(rows_blk)
            rows_k = jnp.concatenate([h, l1, l2], axis=1)  # (48, 3·tc)
            onehot = jnp.concatenate([onehot] * 3, axis=0)
        else:
            rows_k = rows_blk.astype(jnp.bfloat16)
        row_c = jax.lax.dot_general(
            rows_k,
            onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (48, Rt)
        b_c = jnp.sum(jnp.where(win, beta, 0.0), axis=0)
        g_c = jnp.sum(jnp.where(win, gamma, 0.0), axis=0)
        bt_ref[0, :] = jnp.where(better, c_min, bt_ref[0, :])
        bi_ref[0, :] = jnp.where(better, c_idx + j * tc, bi_ref[0, :])
        bb_ref[0, :] = jnp.where(better, b_c, bb_ref[0, :])
        bg_ref[0, :] = jnp.where(better, g_c, bg_ref[0, :])
        brow_ref[:] = jnp.where(better[None, :], row_c, brow_ref[:])

    def body(carry):
        p, n_stop = carry
        slot = jax.lax.rem(p, 2)
        j = ord_at(p)
        ws_dma(slot, j).wait()
        rows_dma(slot, j).wait()

        do = jnp.any(reach_lanes(j, bt_ref[0, :]))
        jax.lax.cond(do, lambda: compute_chunk(slot, j), lambda: None)

        # Early exit: tmin is sorted ascending, so once the NEXT
        # chunk's distance bound exceeds every live lane's best-t, no
        # remaining chunk can improve any lane — stop walking (the two
        # in-flight prefetches are drained below).
        bt_max = jnp.max(jnp.where(live, bt_ref[0, :], 0.0))
        nxt = jnp.minimum(p + 1, nc - 1)
        n_stop = jnp.where(
            (p + 1 < n_stop) & (tmin_ref[row, nxt] > bt_max),
            p + 1,
            n_stop,
        )

        issue(slot, ord_at(p + 2))  # unconditional prefetch (see ord_at)
        return (p + 1, n_stop)

    p_end, _ = jax.lax.while_loop(
        lambda c: c[0] < c[1], body, (jnp.int32(0), n0)
    )

    # Drain the two outstanding prefetches (positions p_end, p_end+1 —
    # possibly clamped duplicates; the waits match by copy size).
    ws_dma(jax.lax.rem(p_end, 2), ord_at(p_end)).wait()
    rows_dma(jax.lax.rem(p_end, 2), ord_at(p_end)).wait()
    ws_dma(jax.lax.rem(p_end + 1, 2), ord_at(p_end + 1)).wait()
    rows_dma(jax.lax.rem(p_end + 1, 2), ord_at(p_end + 1)).wait()

    hit = bt_ref[0, :] < _BIG
    hitf = hit.astype(jnp.float32)
    idx_ref[0, :] = jnp.where(hit, bi_ref[0, :], jnp.int32(-1))
    tbg_ref[0, :] = jnp.where(hit, bt_ref[0, :], _BIG)
    tbg_ref[1, :] = bb_ref[0, :] * hitf
    tbg_ref[2, :] = bg_ref[0, :] * hitf
    tbg_ref[3, :] = hitf
    shade_ref[:] = brow_ref[12:44, :] * hitf[None, :]


@functools.partial(
    jax.jit,
    static_argnames=("ray_tile", "t_chunk", "interpret", "exact", "terms"),
)
def nearest_shade_traverse(
    ws: jnp.ndarray,  # f32[8, T_pad*6] (pack_transforms_stream, Morton)
    rows_t: jnp.ndarray,  # f32[48, T_pad] (pack_rows_full(...).T)
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
):
    """Traversal megakernel (v5): v4's outputs at tree-traversal cost.

    Same output contract as `nearest_shade_full` — (idx i32[R],
    tbg f32[4, R] = [t, β, γ, hit], shade f32[32, R]) with idx in the
    caller's (Morton-permuted) triangle order. SMEM bounds the chunk
    count: order+tmin (8·nc·8 B) + boxes (nc·24 B) ⇒ ~1M triangles at
    tc=128; coarsen ``t_chunk`` beyond that.
    """
    R = pos3.shape[1]
    K_T6 = ws.shape[1]
    assert K_T6 % (6 * t_chunk) == 0, (K_T6, t_chunk)
    nc = K_T6 // (6 * t_chunk)
    T_pad = K_T6 // 6
    assert rows_t.shape == (48, T_pad), (rows_t.shape, K_T6)
    assert clo.shape == (nc, 3) and chi.shape == (nc, 3), (clo.shape, nc)
    if live is None:
        live = jnp.ones((R,), jnp.float32)
    live_f = live.astype(jnp.float32)[None, :]
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

    order, tmins, n_reach = tile_chunk_order(
        pos3, dir3, live_f, clo, chi, ray_tile
    )

    K = (48 if terms == 3 else 24) if exact else 8
    idx, tbg, shade = pl.pallas_call(
        functools.partial(
            _traverse_kernel, t_chunk=t_chunk, exact=exact, terms=terms
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
                (8, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # ws (stays in HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # rows
            pl.BlockSpec(memory_space=pltpu.SMEM),  # clo
            pl.BlockSpec(memory_space=pltpu.SMEM),  # chi
        ],
        out_specs=(
            pl.BlockSpec(
                (1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (4, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (32, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            _sds((1, Rp), jnp.int32, rays),
            _sds((4, Rp), jnp.float32, rays),
            _sds((32, Rp), jnp.float32, rays),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, ray_tile), jnp.bfloat16),  # packed rays
            pltpu.VMEM((2, 8, 6 * t_chunk), jnp.float32),  # ws double buf
            pltpu.VMEM((2, 48, t_chunk), jnp.float32),  # rows double buf
            pltpu.VMEM((1, ray_tile), jnp.float32),  # best t
            pltpu.VMEM((1, ray_tile), jnp.int32),  # best index
            pltpu.VMEM((1, ray_tile), jnp.float32),  # best beta
            pltpu.VMEM((1, ray_tile), jnp.float32),  # best gamma
            pltpu.VMEM((48, ray_tile), jnp.float32),  # best row
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(n_reach, order, tmins, rays, live_f, ws, rows_t, clo, chi)
    return idx[0, :R], tbg[:, :R], shade[:, :R]


@functools.lru_cache(maxsize=None)
def _make_diff_traverse(ray_tile, t_chunk, interpret, exact, terms=3):
    """Differentiable wrapper around `nearest_shade_traverse` — same
    argmin-differentiation scheme as
    `intersect_pallas._make_diff_megakernel`: forward is the traversal
    kernel, backward is the vjp of the exact winner-row recompute at
    the kernel-chosen indices (geometry gradients route through the
    rows table; ``ws``/boxes get zero cotangent)."""

    @jax.custom_vjp
    def f(ws, rows_t, pos3, dir3, live, clo, chi):
        return nearest_shade_traverse(
            ws, rows_t, clo, chi, pos3, dir3, live,
            ray_tile=ray_tile, t_chunk=t_chunk,
            interpret=interpret, exact=exact, terms=terms,
        )

    def fwd(ws, rows_t, pos3, dir3, live, clo, chi):
        idx, tbg, shade = f(ws, rows_t, pos3, dir3, live, clo, chi)
        return (idx, tbg, shade), (idx, rows_t, pos3, dir3, live, clo, chi)

    def bwd(res, cts):
        idx, rows_t, pos3, dir3, live, clo, chi = res
        _, ct_tbg, ct_shade = cts  # idx is int: cotangent is float0
        _, vjp = jax.vjp(
            lambda rt, p, d: _recompute_winner(rt.T, idx, p, d),
            rows_t, pos3, dir3,
        )
        d_rows_t, d_pos, d_dir = vjp((ct_tbg, ct_shade))
        return (
            jnp.zeros((8, rows_t.shape[1] * 6), rows_t.dtype),
            d_rows_t, d_pos, d_dir,
            jnp.zeros_like(live), jnp.zeros_like(clo), jnp.zeros_like(chi),
        )

    f.defvjp(fwd, bwd)
    return f


def nearest_shade_traverse_diff(
    ws, rows_t, pos3, dir3, live=None, clo=None, chi=None, *,
    ray_tile: int = _RAY_TILE, t_chunk: int = 128,
    interpret: bool = False, exact: bool = True, terms: int = 3,
):
    """`nearest_shade_traverse` with a.e.-correct gradients."""
    if live is None:
        live = jnp.ones((pos3.shape[1],), jnp.float32)
    return _make_diff_traverse(ray_tile, t_chunk, interpret, exact, terms)(
        ws, rows_t, pos3, dir3, live, clo, chi
    )
