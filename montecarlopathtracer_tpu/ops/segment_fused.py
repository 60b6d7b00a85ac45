"""Whole-segment megakernel: intersect + sample + state update as ONE
Pallas call per wavefront segment — with a working in-kernel backward.

The reference's `rayTraceKernel` runs the entire path segment (ray
setup, intersection, BSDF sampling, state update, accumulation) in one
device program per launch (CVMCTracer/CVMCTracer/CUDA/CUTracer.cu:179-218).
Round 4 measured the repo's remaining gap to that shape:

- forward: ~13% of a headline pass was the non-kernel segment epilogue
  (sampling/RNG-masking XLA fusions between intersector calls);
- backward: fwd+bwd ran at 2.24× forward, dominated by dozens of small
  elementwise vjp transpose fusions (PERF.md r4 headroom #3/#4).

This module closes both by extending the v4 streamed intersection
megakernel (`intersect_pallas._mega_kernel_v4`, whose chunk loop it
shares verbatim via `_v4_process_chunk`) with the segment epilogue in
the final chunk step, and pairing it with a hand-shaped backward
kernel.

Why the backward works where round 4's attempt failed: tracing
``jax.vjp`` of the (3, R)-block epilogue inside a kernel produced
sublane reductions over offset layouts, which Mosaic rejects ("input
layout must have zero offsets over dimensions that are being reduced").
The fix is structural: `_segment_core_rows` re-expresses the entire
segment — winner recompute (`_recompute_from_full` semantics) + the
sampler/masking epilogue — on **rank-1 rows** (tuples of ``(Rt,)``
vectors instead of ``(3, Rt)`` blocks). Every operation is elementwise,
so its vjp is elementwise too: no reductions, no pads over the sublane
axis, nothing for Mosaic to refuse. The tuple-form samplers here are
op-for-op transcriptions of `ops.sampling` (tested identical).

Estimator compatibility: the forward kernel's epilogue consumes the
kernel's own winner values (bt/bb/bg/brow scratch — exactly what
`nearest_shade_full` outputs), so the whole-segment path is
bit-identical to the split megakernel+XLA path on CPU/interpret and
within elementwise-lowering tolerance on TPU. Random streams are
unchanged: uniforms stay host-drawn inputs.

Gradient structure (same a.e. gradients as the split path):
``custom_vjp`` around the whole segment. Forward = the one kernel,
zero per-ray gathers. Backward = ONE full-width row gather of the
winner rows (`pack_rows_full` layout; the argmin index is
piecewise-constant), one backward Pallas kernel evaluating the vjp of
`_segment_core_rows`, and a `scatter_rows` one-hot MXU matmul carrying
the row cotangents back to the (T_pad, 48) table.
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
    _SCATTER_ROWS_MAX_T,
    _sds,
    _slab_reach,
    _soa_rays,
    _v4_init_tile,
    _v4_process_chunk,
    scatter_rows,
)

_EPS = 1.19209290e-7  # FLT_EPSILON (ops/sampling.py)

# Ray tile for the backward / rows-epilogue kernels (rank-1 row code:
# longer is better until VMEM; swept on-chip r5: 4096 best by ~1%,
# gradients bit-identical across tiles).
_BWD_TILE = 4096


def _divisor_tile(R: int, want: int) -> int:
    """Largest 128-multiple tile ≤ ``want`` that divides R exactly, if
    one exists within [want/2, want]; else ``want``. A divisor tile
    makes every pad/slice around the kernel disappear (480k rays pad
    3,328 dead lanes at tile 4096 but ZERO at 3840 — the pad ops
    measured ~2% of a grad step). Results are tile-size invariant
    (lane-independent kernels), so this is performance-only."""
    r128 = -(-R // 128) * 128
    t = min(want, r128)
    for cand in range(t, max(t // 2, 128) - 1, -128):
        if R % cand == 0:
            return cand
    return t


# ---------------------------------------------------------------------------
# Tuple-form ("rows") vector math: op-for-op transcriptions of
# ops/sampling.py on 3-tuples of (Rt,) rows. Bit-identical per lane —
# same primitive ops in the same order — but rank-1 throughout, which
# keeps both the forward AND the traced vjp free of sublane reductions
# and pads (the Mosaic restriction that sank the r4 in-kernel backward).
# ---------------------------------------------------------------------------


def _dot3t(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _neg3t(v):
    return (-v[0], -v[1], -v[2])


def _where3t(c, a, b):
    return (
        jnp.where(c, a[0], b[0]),
        jnp.where(c, a[1], b[1]),
        jnp.where(c, a[2], b[2]),
    )


def _normalize3t(v):
    n = jnp.sqrt(jnp.maximum(_dot3t(v, v), _EPS * _EPS))
    return (v[0] / n, v[1] / n, v[2] / n)


def _reflect_t(indir, normal):
    s = 2.0 * _dot3t(indir, normal)
    return (
        indir[0] - normal[0] * s,
        indir[1] - normal[1] * s,
        indir[2] - normal[2] * s,
    )


def _rotate_to_frame_t(local, normal):
    """`ops.sampling._rotate_to_frame` on row tuples (Utils.hpp:54-68)."""
    nx, ny, nz = normal
    dx, dy, dz = local
    s2 = jnp.maximum(1.0 - ny * ny, _EPS * _EPS)
    inv_len = 1.0 / jnp.sqrt(s2)
    length = jnp.sqrt(s2)
    rx = (nz * dx + nx * ny * dz) * inv_len + nx * dy
    ry = ny * dy - dz * length
    rz = (-nx * dx + nz * ny * dz) * inv_len + nz * dy
    rotated = (rx, ry, rz)
    near_neg_y = jnp.abs(ny + 1.0) < _EPS
    near_pos_y = jnp.abs(ny - 1.0) < _EPS
    out = _where3t(near_pos_y, local, rotated)
    return _where3t(near_neg_y, _neg3t(local), out)


def _sample_hemi_t(u1, u2, normal):
    sin_t = jnp.sqrt(u1)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    phi = 2.0 * jnp.pi * u2
    local = (sin_t * jnp.cos(phi), cos_t, sin_t * jnp.sin(phi))
    return _rotate_to_frame_t(local, normal)


def _sample_phong_t(u1, u2, normal, indir, ns):
    cos_t = jnp.power(jnp.maximum(u1, 1e-30), 1.0 / (ns + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u2
    local = (sin_t * jnp.cos(phi), cos_t, sin_t * jnp.sin(phi))
    half = _rotate_to_frame_t(local, normal)
    s = 2.0 * _dot3t(indir, half)
    return (
        indir[0] - half[0] * s,
        indir[1] - half[1] * s,
        indir[2] - half[2] * s,
    )


def _sample_phong_reflect_t(u1, u2, normal, indir, ns):
    cos_t = jnp.power(jnp.maximum(u1, 1e-30), 1.0 / (ns + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u2
    local = (sin_t * jnp.cos(phi), cos_t, sin_t * jnp.sin(phi))
    return _rotate_to_frame_t(local, _reflect_t(indir, normal))


def _sample_fresnel_t(u, normal, indir, tr, ni):
    ndoti = _dot3t(indir, normal)
    tr_eff = tr * (1.0 - jnp.power(1.0 - jnp.abs(ndoti), 5.0))
    refract = u < tr_eff
    entering = ndoti <= 0.0

    def _sqrt_nonneg(x):
        # NaN-free backward at the TIR/grazing boundary (see
        # ops/sampling.py r4 note): d(sqrt) at 0 is ∞ and 0·∞ = NaN.
        pos = x > 0.0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)

    in_rad = 1.0 - (1.0 - ndoti * ndoti) / (ni * ni)
    in_alpha = -ndoti / ni - _sqrt_nonneg(in_rad)
    d_in = _normalize3t(
        (
            normal[0] * in_alpha + indir[0] / ni,
            normal[1] * in_alpha + indir[1] / ni,
            normal[2] * in_alpha + indir[2] / ni,
        )
    )
    test = 1.0 - (1.0 - ndoti * ndoti) * ni * ni
    out_alpha = -ndoti * ni + _sqrt_nonneg(test)
    d_out = _normalize3t(
        (
            normal[0] * out_alpha + indir[0] * ni,
            normal[1] * out_alpha + indir[1] * ni,
            normal[2] * out_alpha + indir[2] * ni,
        )
    )
    d_reflect = _reflect_t(indir, normal)
    d_refract = _where3t(
        entering, d_in, _where3t(test < 0.0, d_reflect, d_out)
    )
    return _where3t(refract, d_refract, d_reflect)


# ---------------------------------------------------------------------------
# Segment semantics on rows
# ---------------------------------------------------------------------------


def _epilogue_core(
    pos, dir_, tput, res,  # 3-tuples of (Rt,) — diff
    t, beta, gamma,  # (Rt,) masked winner values (tbg rows 0..2) — diff
    shade,  # 32-tuple of (Rt,) rows (already ×hitf) — diff
    *,
    hit,  # (Rt,) bool — nondiff
    act,  # (Rt,) bool — nondiff
    u1, u2, urr,  # (Rt,) f32 — nondiff
    fg, do_rr, hard_kill,  # scalar bool — nondiff
    mode: str,
    illum: float,
    eps_offset: float,
    refract_kd: bool,
    phong_model: str,
):
    """One segment's post-intersector semantics on rows — the single
    semantics source for the whole-segment forward kernel, the fused
    traverse epilogue, and the backward kernel. Mirrors
    `render.integrator.trace_radiance_soa`'s segment body exactly
    (CUTracer.cu:103-175 fixed mode, rtx.hlsl:304-371 RR mode).

    Returns (new_pos, new_dir, new_tput, new_result, still) with the
    vectors as 3-tuples of rows and ``still`` an (Rt,) bool.
    """
    hitf = hit.astype(jnp.float32)
    yhat = (jnp.zeros_like(hitf), jnp.ones_like(hitf), jnp.zeros_like(hitf))
    n0 = _where3t(hit, (shade[0], shade[1], shade[2]), yhat)
    n1 = _where3t(hit, (shade[3], shade[4], shade[5]), yhat)
    n2 = _where3t(hit, (shade[6], shade[7], shade[8]), yhat)
    ka = (shade[9], shade[10], shade[11])
    kd = (shade[12], shade[13], shade[14])
    ks = (shade[15], shade[16], shade[17])
    ns = shade[18]
    tr = shade[19]
    ni = jnp.where(hit, shade[20], 1.0)

    miss = ~hit
    is_emit = (ka[0] > 0.0) | (ka[1] > 0.0) | (ka[2] > 0.0)

    if mode == "rr":
        p = jnp.maximum(jnp.maximum(tput[0], tput[1]), tput[2])
        survive = p > urr
        rr_dead = do_rr & ~survive
        pm = jnp.maximum(p, 1e-20)
        cond = do_rr & survive
        tput = _where3t(
            cond, (tput[0] / pm, tput[1] / pm, tput[2] / pm), tput
        )
        dead_now = miss | rr_dead | hard_kill
    else:
        dead_now = miss

    emit_now = act & ~dead_now & (is_emit | fg)
    ill = jnp.float32(illum)
    emitted = (tput[0] * ka[0] * ill, tput[1] * ka[1] * ill,
               tput[2] * ka[2] * ill)
    res = _where3t(emit_now, emitted, res)
    still = act & ~dead_now & ~emit_now

    # --- scatter ------------------------------------------------------
    w0 = 1.0 - beta - gamma
    nrm = (
        n0[0] * w0 + n1[0] * beta + n2[0] * gamma,
        n0[1] * w0 + n1[1] * beta + n2[1] * gamma,
        n0[2] * w0 + n1[2] * beta + n2[2] * gamma,
    )
    nn = jnp.sqrt(jnp.maximum(_dot3t(nrm, nrm), _EPS * _EPS))
    normal = (nrm[0] / nn, nrm[1] / nn, nrm[2] / nn)

    d_fresnel = _sample_fresnel_t(u1, normal, dir_, tr, ni)
    phong_fn = (
        _sample_phong_reflect_t
        if phong_model == "phong"
        else _sample_phong_t
    )
    d_phong = phong_fn(u1, u2, normal, dir_, ns)
    d_hemi = _sample_hemi_t(u1, u2, normal)
    flip = _dot3t(dir_, normal) > 0.0
    d_diff = _where3t(flip, _neg3t(d_hemi), d_hemi)

    is_fresnel = tr > 0.0
    is_phong = ~is_fresnel & (ns > 1.0)
    new_dir = _where3t(
        is_fresnel, d_fresnel, _where3t(is_phong, d_phong, d_diff)
    )
    ones = jnp.ones_like(kd[0])
    albedo_fresnel = kd if refract_kd else (ones, ones, ones)
    albedo = _where3t(
        is_fresnel, albedo_fresnel, _where3t(is_phong, ks, kd)
    )
    new_tput = _where3t(
        still,
        (tput[0] * albedo[0], tput[1] * albedo[1], tput[2] * albedo[2]),
        tput,
    )
    th = t * hitf
    point = (pos[0] + th * dir_[0], pos[1] + th * dir_[1],
             pos[2] + th * dir_[2])
    eps = jnp.float32(eps_offset)
    new_pos = _where3t(
        still,
        (point[0] + new_dir[0] * eps, point[1] + new_dir[1] * eps,
         point[2] + new_dir[2] * eps),
        pos,
    )
    new_dir = _where3t(still, new_dir, dir_)
    return new_pos, new_dir, new_tput, res, still


def _recompute_rows(full, hit, pos, dir_):
    """`intersect_pallas._recompute_from_full` on rows: masked winner
    (t, beta, gamma) + the 32 shading rows (×hitf) from the 48 gathered
    row values. All elementwise."""
    hitf = hit.astype(jnp.float32)

    def prime(base):
        m0, m1, m2, nma = full[base], full[base + 1], full[base + 2], full[base + 3]
        op = m0 * pos[0] + m1 * pos[1] + m2 * pos[2] + nma
        dp = m0 * dir_[0] + m1 * dir_[1] + m2 * dir_[2]
        return op, dp

    opx, dpx = prime(0)
    opy, dpy = prime(4)
    opz, dpz = prime(8)
    safe = jnp.abs(dpz) > 1e-12
    t_raw = jnp.where(safe, -opz / jnp.where(safe, dpz, 1.0), _BIG)
    beta = opx + t_raw * dpx
    gamma = opy + t_raw * dpy
    t = jnp.where(hit, t_raw, _BIG)
    beta = jnp.where(hit, beta, 0.0)
    gamma = jnp.where(hit, gamma, 0.0)
    shade = tuple(full[12 + k] * hitf for k in range(32))
    return t, beta, gamma, shade


def _segment_core_rows(
    pos, dir_, tput, res,  # 3-tuples of (Rt,) — diff
    full,  # 48-tuple of (Rt,) — diff
    *,
    hit, act, u1, u2, urr, fg, do_rr, hard_kill,
    mode, illum, eps_offset, refract_kd, phong_model,
):
    """Recompute + epilogue: the differentiable whole-segment composite
    (what the backward kernel vjps). Returns only the diff outputs."""
    t, beta, gamma, shade = _recompute_rows(full, hit, pos, dir_)
    new_pos, new_dir, new_tput, new_res, _ = _epilogue_core(
        pos, dir_, tput, res, t, beta, gamma, shade,
        hit=hit, act=act, u1=u1, u2=u2, urr=urr,
        fg=fg, do_rr=do_rr, hard_kill=hard_kill,
        mode=mode, illum=illum, eps_offset=eps_offset,
        refract_kd=refract_kd, phong_model=phong_model,
    )
    return new_pos, new_dir, new_tput, new_res


def _rows3(ref):
    return (ref[0, :], ref[1, :], ref[2, :])


def _write3(ref, v):
    ref[0, :] = v[0]
    ref[1, :] = v[1]
    ref[2, :] = v[2]


# ---------------------------------------------------------------------------
# Forward: the whole-segment megakernel
# ---------------------------------------------------------------------------


def _mega_segment_kernel(
    *refs, t_chunk, cull, exact, terms, sub,
    mode, illum, eps_offset, refract_kd, phong_model,
    lane_flags=False,
):
    """v4 chunk loop + in-kernel segment epilogue at the last chunk.

    ``lane_flags``: flags arrive as per-lane f32 rows (3, Rt) in VMEM
    instead of per-segment scalars in SMEM — the regenerating-wavefront
    integrator (render/regen.py) mixes lanes at different path depths
    in one wavefront, so final-gather/do_rr/hard_kill become per-lane
    predicates (`_epilogue_core` is elementwise either way)."""
    if cull:
        (rays_ref, live_ref, ws_ref, rows_ref, clo_ref, chi_ref,
         tput_ref, res_ref, u1_ref, u2_ref, urr_ref, flags_ref,
         idx_ref, npos_ref, ndir_ref, ntput_ref, nres_ref, still_ref,
         rk_ref, bt_ref, bi_ref, bb_ref, bg_ref, brow_ref) = refs
    else:
        (rays_ref, live_ref, ws_ref, rows_ref,
         tput_ref, res_ref, u1_ref, u2_ref, urr_ref, flags_ref,
         idx_ref, npos_ref, ndir_ref, ntput_ref, nres_ref, still_ref,
         rk_ref, bt_ref, bi_ref, bb_ref, bg_ref, brow_ref) = refs
        clo_ref = chi_ref = None
    ci = pl.program_id(1)
    nc = pl.num_programs(1)
    live = live_ref[0, :] > 0.0
    any_live = jnp.any(live)

    @pl.when((ci == 0) & any_live)
    def _():
        _v4_init_tile(
            rays_ref, rk_ref, bt_ref, bi_ref, bb_ref, bg_ref, brow_ref,
            exact=exact, terms=terms,
        )

    if cull:
        reach = _slab_reach(
            rays_ref[:], clo_ref, chi_ref, ci, bt_ref[0, :], live
        )
        run = jnp.any(reach) & any_live
    else:
        run = any_live

    @pl.when(run)
    def _():
        _v4_process_chunk(
            ws_ref, rows_ref, rk_ref, bt_ref, bi_ref, bb_ref, bg_ref,
            brow_ref, ci, t_chunk=t_chunk, exact=exact, terms=terms,
            sub=sub,
        )

    @pl.when((ci == nc - 1) & ~any_live)
    def _():
        # All-dead tile (RR tails; sorted wavefronts compact the dead
        # to the end): the segment is an identity — passthrough the
        # state without touching the (uninitialized) winner scratch or
        # running the epilogue's sampler math.
        idx_ref[0, :] = jnp.full(idx_ref.shape[1:], -1, jnp.int32)
        npos_ref[:] = rays_ref[0:3, :]
        ndir_ref[:] = rays_ref[4:7, :]
        ntput_ref[:] = tput_ref[:]
        nres_ref[:] = res_ref[:]
        still_ref[0, :] = jnp.zeros(still_ref.shape[1:], jnp.float32)

    @pl.when((ci == nc - 1) & any_live)
    def _():
        bt = bt_ref[0, :]
        hit = bt < _BIG
        hitf = hit.astype(jnp.float32)
        idx_ref[0, :] = jnp.where(hit, bi_ref[0, :], jnp.int32(-1))
        # The winner values exactly as `nearest_shade_full` outputs them.
        t = jnp.where(hit, bt, _BIG)
        beta = bb_ref[0, :] * hitf
        gamma = bg_ref[0, :] * hitf
        shade = tuple(brow_ref[k, :] * hitf for k in range(32))
        pos = (rays_ref[0, :], rays_ref[1, :], rays_ref[2, :])
        dir_ = (rays_ref[4, :], rays_ref[5, :], rays_ref[6, :])
        if lane_flags:
            fg = flags_ref[0, :] > 0.0
            do_rr = flags_ref[1, :] > 0.0
            hard_kill = flags_ref[2, :] > 0.0
        else:
            fg = flags_ref[0, 0] > 0.0
            do_rr = flags_ref[1, 0] > 0.0
            hard_kill = flags_ref[2, 0] > 0.0
        new_pos, new_dir, new_tput, new_res, still = _epilogue_core(
            pos, dir_,
            _rows3(tput_ref), _rows3(res_ref),
            t, beta, gamma, shade,
            hit=hit, act=live,
            u1=u1_ref[0, :], u2=u2_ref[0, :], urr=urr_ref[0, :],
            fg=fg, do_rr=do_rr, hard_kill=hard_kill,
            mode=mode, illum=illum, eps_offset=eps_offset,
            refract_kd=refract_kd, phong_model=phong_model,
        )
        _write3(npos_ref, new_pos)
        _write3(ndir_ref, new_dir)
        _write3(ntput_ref, new_tput)
        _write3(nres_ref, new_res)
        still_ref[0, :] = still.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ray_tile", "t_chunk", "interpret", "exact", "cull", "terms",
        "sub", "mode", "illum", "eps_offset", "refract_kd", "phong_model",
        "lane_flags",
    ),
)
def mega_segment_fwd(
    ws, rows, pos3, dir3, tput, res, live, u1, u2, urr, flags,
    clo=None, chi=None, *,
    ray_tile: int = _RAY_TILE, t_chunk: int = 256,
    interpret: bool = False, exact: bool = True, cull: bool = False,
    terms: int = 3, sub: int = 1,
    mode: str = "fixed", illum: float = 10.0, eps_offset: float = 0.01,
    refract_kd: bool = True, phong_model: str = "blinn",
    lane_flags: bool = False,
):
    """Whole-segment forward: ONE pallas_call returns
    (idx i32[R], new_pos, new_dir, new_tput, new_result f32[3, R],
    still f32[R]). Interface mirrors `nearest_shade_full` plus the
    epilogue state (tput/res f32[3, R], uniforms f32[R], flags
    f32[3, 1] = [final_gather, do_rr, hard_kill] — or f32[3, R]
    per-lane predicates with ``lane_flags``, see
    `_mega_segment_kernel`)."""
    R = pos3.shape[1]
    K_T6 = ws.shape[1]
    assert K_T6 % (6 * t_chunk) == 0, (K_T6, t_chunk)
    nc = K_T6 // (6 * t_chunk)
    T_pad = K_T6 // 6
    assert rows.shape == (T_pad, 48), (rows.shape, K_T6)
    if cull:
        assert clo is not None and clo.shape[0] == nc, (nc,)
    live_f = live.astype(jnp.float32).reshape(1, -1)
    u1 = u1.reshape(1, -1)
    u2 = u2.reshape(1, -1)
    urr = urr.reshape(1, -1)
    pad = (-R) % ray_tile
    if pad:
        def padv(x, k=0.0):
            return jnp.concatenate(
                [x, jnp.full((x.shape[0], pad), k, x.dtype)], axis=1
            )
        pos3, dir3, tput, res = map(padv, (pos3, dir3, tput, res))
        live_f, u1, u2, urr = map(padv, (live_f, u1, u2, urr))
        if lane_flags:
            flags = padv(flags)
    Rp = R + pad
    rays = _soa_rays(pos3, dir3, Rp)

    def vec(k):
        return pl.BlockSpec(
            (k, ray_tile), lambda i, c: (0, i), memory_space=pltpu.VMEM
        )

    in_specs = [
        vec(8),  # rays
        vec(1),  # live
        pl.BlockSpec(
            (8, 6 * t_chunk), lambda i, c: (0, c), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (t_chunk, 48), lambda i, c: (c, 0), memory_space=pltpu.VMEM
        ),
    ]
    args = [rays, live_f, ws, rows]
    if cull:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        args += [clo, chi]
    flags_spec = (
        vec(3) if lane_flags else pl.BlockSpec(memory_space=pltpu.SMEM)
    )
    in_specs += [vec(3), vec(3), vec(1), vec(1), vec(1), flags_spec]
    args += [tput, res, u1, u2, urr, flags]

    outs = pl.pallas_call(
        functools.partial(
            _mega_segment_kernel, t_chunk=t_chunk, cull=cull,
            exact=exact, terms=terms, sub=sub,
            mode=mode, illum=illum, eps_offset=eps_offset,
            refract_kd=refract_kd, phong_model=phong_model,
            lane_flags=lane_flags,
        ),
        grid=(Rp // ray_tile, nc),
        in_specs=in_specs,
        out_specs=(
            vec(1), vec(3), vec(3), vec(3), vec(3), vec(1),
        ),
        out_shape=(
            _sds((1, Rp), jnp.int32, rays),
            _sds((3, Rp), jnp.float32, rays),
            _sds((3, Rp), jnp.float32, rays),
            _sds((3, Rp), jnp.float32, rays),
            _sds((3, Rp), jnp.float32, rays),
            _sds((1, Rp), jnp.float32, rays),
        ),
        scratch_shapes=[
            pltpu.VMEM(
                ((48 if terms == 3 else 24) if exact else 8, ray_tile),
                jnp.bfloat16,
            ),
            pltpu.VMEM((1, ray_tile), jnp.float32),  # best t
            pltpu.VMEM((1, ray_tile), jnp.int32),  # best index
            pltpu.VMEM((1, ray_tile), jnp.float32),  # best beta
            pltpu.VMEM((1, ray_tile), jnp.float32),  # best gamma
            pltpu.VMEM((32, ray_tile), jnp.float32),  # best shading row
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    idx, npos, ndir, ntput, nres, still = outs
    return (
        idx[0, :R], npos[:, :R], ndir[:, :R], ntput[:, :R],
        nres[:, :R], still[0, :R],
    )


# ---------------------------------------------------------------------------
# Backward: one elementwise vjp kernel over ray tiles
# ---------------------------------------------------------------------------


def _segment_bwd_kernel(
    *refs, mode, illum, eps_offset, refract_kd, phong_model,
):
    (pos_ref, dir_ref, tput_ref, res_ref, act_ref, hit_ref, full_ref,
     u1_ref, u2_ref, urr_ref, flags_ref,
     cnp_ref, cnd_ref, cnt_ref, cnr_ref,
     dpos_ref, ddir_ref, dtput_ref, dres_ref, dfull_ref) = refs

    core = functools.partial(
        _segment_core_rows,
        hit=hit_ref[0, :] > 0.0,
        act=act_ref[0, :] > 0.0,
        u1=u1_ref[0, :], u2=u2_ref[0, :], urr=urr_ref[0, :],
        fg=flags_ref[0, 0] > 0.0,
        do_rr=flags_ref[1, 0] > 0.0,
        hard_kill=flags_ref[2, 0] > 0.0,
        mode=mode, illum=illum, eps_offset=eps_offset,
        refract_kd=refract_kd, phong_model=phong_model,
    )
    full = tuple(full_ref[k, :] for k in range(48))
    _, vjp = jax.vjp(
        core, _rows3(pos_ref), _rows3(dir_ref), _rows3(tput_ref),
        _rows3(res_ref), full,
    )
    d_pos, d_dir, d_tput, d_res, d_full = vjp(
        (_rows3(cnp_ref), _rows3(cnd_ref), _rows3(cnt_ref),
         _rows3(cnr_ref))
    )
    _write3(dpos_ref, d_pos)
    _write3(ddir_ref, d_dir)
    _write3(dtput_ref, d_tput)
    _write3(dres_ref, d_res)
    for k in range(48):
        dfull_ref[k, :] = d_full[k]


@functools.partial(
    jax.jit,
    static_argnames=(
        "ray_tile", "interpret",
        "mode", "illum", "eps_offset", "refract_kd", "phong_model",
    ),
)
def segment_backward(
    pos3, dir3, tput, res, act, hit, fullT,  # fullT: f32[48, R]
    u1, u2, urr, flags, ct_npos, ct_ndir, ct_ntput, ct_nres, *,
    ray_tile: int = 2048, interpret: bool = False,
    mode: str = "fixed", illum: float = 10.0, eps_offset: float = 0.01,
    refract_kd: bool = True, phong_model: str = "blinn",
):
    """Whole-segment vjp as ONE Pallas kernel: given the segment inputs
    and the output cotangents, returns (d_pos, d_dir, d_tput, d_res
    f32[3, R], d_full f32[48, R] — per-ray row cotangents for
    `scatter_rows`)."""
    R = pos3.shape[1]
    act = act.astype(jnp.float32).reshape(1, -1)
    hit = hit.astype(jnp.float32).reshape(1, -1)
    u1 = u1.reshape(1, -1)
    u2 = u2.reshape(1, -1)
    urr = urr.reshape(1, -1)
    ray_tile = _divisor_tile(R, ray_tile)
    pad = (-R) % ray_tile
    if pad:
        def padv(x):
            return jnp.concatenate(
                [x, jnp.zeros((x.shape[0], pad), x.dtype)], axis=1
            )
        (pos3, dir3, tput, res, act, hit, fullT, u1, u2, urr,
         ct_npos, ct_ndir, ct_ntput, ct_nres) = map(
            padv,
            (pos3, dir3, tput, res, act, hit, fullT, u1, u2, urr,
             ct_npos, ct_ndir, ct_ntput, ct_nres),
        )
    Rp = R + pad

    def vec(k):
        return pl.BlockSpec(
            (k, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    outs = pl.pallas_call(
        functools.partial(
            _segment_bwd_kernel, mode=mode, illum=illum,
            eps_offset=eps_offset, refract_kd=refract_kd,
            phong_model=phong_model,
        ),
        grid=(Rp // ray_tile,),
        in_specs=[
            vec(3), vec(3), vec(3), vec(3), vec(1), vec(1), vec(48),
            vec(1), vec(1), vec(1),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vec(3), vec(3), vec(3), vec(3),
        ],
        out_specs=(vec(3), vec(3), vec(3), vec(3), vec(48)),
        out_shape=(
            _sds((3, Rp), jnp.float32, pos3),
            _sds((3, Rp), jnp.float32, pos3),
            _sds((3, Rp), jnp.float32, pos3),
            _sds((3, Rp), jnp.float32, pos3),
            _sds((48, Rp), jnp.float32, pos3),
        ),
        interpret=interpret,
    )(pos3, dir3, tput, res, act, hit, fullT, u1, u2, urr, flags,
      ct_npos, ct_ndir, ct_ntput, ct_nres)
    d_pos, d_dir, d_tput, d_res, d_full = outs
    sl = slice(0, R)
    return (
        d_pos[:, sl], d_dir[:, sl], d_tput[:, sl], d_res[:, sl],
        d_full[:, sl],
    )


# ---------------------------------------------------------------------------
# custom_vjp: the user-facing whole segment
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_whole_segment(
    ray_tile, t_chunk, interpret, exact, cull, terms, sub,
    mode, illum, eps_offset, refract_kd, phong_model,
):
    kw = dict(
        mode=mode, illum=illum, eps_offset=eps_offset,
        refract_kd=refract_kd, phong_model=phong_model,
    )

    @jax.custom_vjp
    def f(ws, rows, pos3, dir3, tput, res, live, u1, u2, urr, flags,
          clo, chi):
        return mega_segment_fwd(
            ws, rows, pos3, dir3, tput, res, live, u1, u2, urr, flags,
            clo, chi,
            ray_tile=ray_tile, t_chunk=t_chunk, interpret=interpret,
            exact=exact, cull=cull, terms=terms, sub=sub, **kw,
        )

    def fwd(ws, rows, pos3, dir3, tput, res, live, u1, u2, urr, flags,
            clo, chi):
        out = f(ws, rows, pos3, dir3, tput, res, live, u1, u2, urr,
                flags, clo, chi)
        resid = (out[0], rows, pos3, dir3, tput, res, live, u1, u2,
                 urr, flags, clo, chi)
        return out, resid

    def bwd(resid, cts):
        (idx, rows, pos3, dir3, tput, res, live, u1, u2, urr, flags,
         clo, chi) = resid
        _, ct_npos, ct_ndir, ct_ntput, ct_nres, _ = cts
        hit = idx >= 0
        # ONE full-width row gather (partial-row gathers are ~200×
        # slower on XLA-TPU — PERF.md r3) + transpose to lane-major.
        full = rows[jnp.maximum(idx, 0)]  # (R, 48)
        d_pos, d_dir, d_tput, d_res, d_full = segment_backward(
            pos3, dir3, tput, res, live, hit, full.T,
            u1, u2, urr, flags, ct_npos, ct_ndir, ct_ntput, ct_nres,
            ray_tile=min(ray_tile, _BWD_TILE), interpret=interpret,
            **kw,
        )
        T_pad = rows.shape[0]
        if T_pad <= _SCATTER_ROWS_MAX_T:
            # terms=2: cotangent-grade exactness (~1e-5 rel) at half
            # the MXU cost — see scatter_rows.
            d_rows = scatter_rows(
                idx, d_full, T_pad, interpret=interpret, terms=2
            )
        else:
            d_rows = jnp.zeros((T_pad, 48), rows.dtype).at[
                jnp.maximum(idx, 0)
            ].add(jnp.where(hit[:, None], d_full.T, 0.0))
        zeros = lambda x: None if x is None else jnp.zeros_like(x)
        return (
            jnp.zeros((8, T_pad * 6), rows.dtype),  # ws (see
            # _make_diff_megakernel: one canonical geometry encoding)
            d_rows, d_pos, d_dir, d_tput, d_res,
            zeros(live), zeros(u1), zeros(u2), zeros(urr), zeros(flags),
            zeros(clo), zeros(chi),
        )

    f.defvjp(fwd, bwd)
    return f


def whole_segment_megakernel(
    ws, rows, pos3, dir3, tput, res, live, u1, u2, urr, flags,
    clo=None, chi=None, *,
    ray_tile: int = _RAY_TILE, t_chunk: int = 256,
    interpret: bool = False, exact: bool = True, cull: bool = False,
    terms: int = 3, sub: int = 1,
    mode: str = "fixed", illum: float = 10.0, eps_offset: float = 0.01,
    refract_kd: bool = True, phong_model: str = "blinn",
):
    """Differentiable whole-segment megakernel (see module docstring).

    Returns (idx i32[R], new_pos f32[3,R], new_dir f32[3,R],
    new_tput f32[3,R], new_result f32[3,R], still f32[R])."""
    return _make_whole_segment(
        ray_tile, t_chunk, interpret, exact, cull, terms, sub,
        mode, float(illum), float(eps_offset), bool(refract_kd),
        phong_model,
    )(ws, rows, pos3, dir3, tput, res, live, u1, u2, urr, flags, clo, chi)


# ---------------------------------------------------------------------------
# Traverse-path fused epilogue: gathered winner rows → one forward
# kernel (recompute + sampling + state update), same backward.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_whole_segment_rows(
    ray_tile, interpret, mode, illum, eps_offset, refract_kd, phong_model,
):
    kw = dict(
        mode=mode, illum=illum, eps_offset=eps_offset,
        refract_kd=refract_kd, phong_model=phong_model,
    )

    @jax.custom_vjp
    def f(rows, idx, pos3, dir3, tput, res, live, u1, u2, urr, flags):
        hit = idx >= 0
        full = rows[jnp.maximum(idx, 0)]  # (R, 48) full-row gather
        return rows_segment_fwd(
            pos3, dir3, tput, res, live, hit, full.T,
            u1, u2, urr, flags,
            ray_tile=ray_tile, interpret=interpret, **kw,
        )

    def fwd(rows, idx, pos3, dir3, tput, res, live, u1, u2, urr, flags):
        out = f(rows, idx, pos3, dir3, tput, res, live, u1, u2, urr,
                flags)
        return out, (rows, idx, pos3, dir3, tput, res, live, u1, u2,
                     urr, flags)

    def bwd(resid, cts):
        (rows, idx, pos3, dir3, tput, res, live, u1, u2, urr,
         flags) = resid
        ct_npos, ct_ndir, ct_ntput, ct_nres, _ = cts
        hit = idx >= 0
        full = rows[jnp.maximum(idx, 0)]  # re-gather > storing (R, 48)
        d_pos, d_dir, d_tput, d_res, d_full = segment_backward(
            pos3, dir3, tput, res, live, hit, full.T,
            u1, u2, urr, flags, ct_npos, ct_ndir, ct_ntput, ct_nres,
            # The backward holds ~2x the forward's rows (d_full + vjp
            # intermediates): cap its tile like the megakernel path.
            ray_tile=min(ray_tile, _BWD_TILE), interpret=interpret,
            **kw,
        )
        T_pad = rows.shape[0]
        if T_pad <= _SCATTER_ROWS_MAX_T:
            # terms=2: cotangent-grade exactness (~1e-5 rel) at half
            # the MXU cost — see scatter_rows.
            d_rows = scatter_rows(
                idx, d_full, T_pad, interpret=interpret, terms=2
            )
        else:
            d_rows = jnp.zeros((T_pad, 48), rows.dtype).at[
                jnp.maximum(idx, 0)
            ].add(jnp.where(hit[:, None], d_full.T, 0.0))
        import numpy as np

        d_idx = np.zeros(idx.shape, jax.dtypes.float0)
        zeros = jnp.zeros_like
        return (
            d_rows, d_idx, d_pos, d_dir, d_tput, d_res,
            zeros(live), zeros(u1), zeros(u2), zeros(urr), zeros(flags),
        )

    f.defvjp(fwd, bwd)
    return f


def whole_segment_rows(
    rows, idx, pos3, dir3, tput, res, live, u1, u2, urr, flags, *,
    ray_tile: int = 2048, interpret: bool = False,
    mode: str = "fixed", illum: float = 10.0, eps_offset: float = 0.01,
    refract_kd: bool = True, phong_model: str = "blinn",
):
    """Differentiable fused segment epilogue for selection-only
    intersectors (the traverse walk): gather the winner's 48-value row
    once, then run recompute + sampling + state update as ONE forward
    kernel; backward = `segment_backward` + `scatter_rows`. ``idx``
    must be piecewise-constant (stop_gradient'ed by the caller).

    Returns (new_pos, new_dir, new_tput, new_result f32[3, R],
    still f32[R])."""
    return _make_whole_segment_rows(
        ray_tile, interpret, mode, float(illum), float(eps_offset),
        bool(refract_kd), phong_model,
    )(rows, idx, pos3, dir3, tput, res, live, u1, u2, urr, flags)


def _rows_segment_kernel(
    *refs, mode, illum, eps_offset, refract_kd, phong_model,
    lane_flags=False,
):
    (pos_ref, dir_ref, tput_ref, res_ref, act_ref, hit_ref, full_ref,
     u1_ref, u2_ref, urr_ref, flags_ref,
     npos_ref, ndir_ref, ntput_ref, nres_ref, still_ref) = refs
    hit = hit_ref[0, :] > 0.0
    pos = _rows3(pos_ref)
    dir_ = _rows3(dir_ref)
    full = tuple(full_ref[k, :] for k in range(48))
    t, beta, gamma, shade = _recompute_rows(full, hit, pos, dir_)
    if lane_flags:
        fg = flags_ref[0, :] > 0.0
        do_rr = flags_ref[1, :] > 0.0
        hard_kill = flags_ref[2, :] > 0.0
    else:
        fg = flags_ref[0, 0] > 0.0
        do_rr = flags_ref[1, 0] > 0.0
        hard_kill = flags_ref[2, 0] > 0.0
    new_pos, new_dir, new_tput, new_res, still = _epilogue_core(
        pos, dir_, _rows3(tput_ref), _rows3(res_ref),
        t, beta, gamma, shade,
        hit=hit, act=act_ref[0, :] > 0.0,
        u1=u1_ref[0, :], u2=u2_ref[0, :], urr=urr_ref[0, :],
        fg=fg, do_rr=do_rr, hard_kill=hard_kill,
        mode=mode, illum=illum, eps_offset=eps_offset,
        refract_kd=refract_kd, phong_model=phong_model,
    )
    _write3(npos_ref, new_pos)
    _write3(ndir_ref, new_dir)
    _write3(ntput_ref, new_tput)
    _write3(nres_ref, new_res)
    still_ref[0, :] = still.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ray_tile", "interpret",
        "mode", "illum", "eps_offset", "refract_kd", "phong_model",
        "lane_flags",
    ),
)
def rows_segment_fwd(
    pos3, dir3, tput, res, act, hit, fullT, u1, u2, urr, flags, *,
    ray_tile: int = 2048, interpret: bool = False,
    mode: str = "fixed", illum: float = 10.0, eps_offset: float = 0.01,
    refract_kd: bool = True, phong_model: str = "blinn",
    lane_flags: bool = False,
):
    """Fused traverse epilogue forward: winner recompute + sampling +
    state update from pre-gathered rows ``fullT f32[48, R]`` as one
    elementwise kernel. Returns (new_pos, new_dir, new_tput,
    new_result f32[3, R], still f32[R])."""
    R = pos3.shape[1]
    act = act.astype(jnp.float32).reshape(1, -1)
    hit = hit.astype(jnp.float32).reshape(1, -1)
    u1 = u1.reshape(1, -1)
    u2 = u2.reshape(1, -1)
    urr = urr.reshape(1, -1)
    ray_tile = _divisor_tile(R, ray_tile)
    pad = (-R) % ray_tile
    if pad:
        def padv(x):
            return jnp.concatenate(
                [x, jnp.zeros((x.shape[0], pad), x.dtype)], axis=1
            )
        (pos3, dir3, tput, res, act, hit, fullT, u1, u2, urr) = map(
            padv, (pos3, dir3, tput, res, act, hit, fullT, u1, u2, urr)
        )
        if lane_flags:
            flags = padv(flags)
    Rp = R + pad

    def vec(k):
        return pl.BlockSpec(
            (k, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    outs = pl.pallas_call(
        functools.partial(
            _rows_segment_kernel, mode=mode, illum=illum,
            eps_offset=eps_offset, refract_kd=refract_kd,
            phong_model=phong_model, lane_flags=lane_flags,
        ),
        grid=(Rp // ray_tile,),
        in_specs=[
            vec(3), vec(3), vec(3), vec(3), vec(1), vec(1), vec(48),
            vec(1), vec(1), vec(1),
            vec(3) if lane_flags
            else pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(vec(3), vec(3), vec(3), vec(3), vec(1)),
        out_shape=(
            _sds((3, Rp), jnp.float32, pos3),
            _sds((3, Rp), jnp.float32, pos3),
            _sds((3, Rp), jnp.float32, pos3),
            _sds((3, Rp), jnp.float32, pos3),
            _sds((1, Rp), jnp.float32, pos3),
        ),
        interpret=interpret,
    )(pos3, dir3, tput, res, act, hit, fullT, u1, u2, urr, flags)
    npos, ndir, ntput, nres, still = outs
    sl = slice(0, R)
    return (
        npos[:, sl], ndir[:, sl], ntput[:, sl], nres[:, sl],
        still[0, sl],
    )
