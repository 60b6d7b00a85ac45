"""Fused path-segment epilogue kernels (sampling + masking + state
update) — the post-intersector half of a wavefront segment as ONE
Pallas call per direction.

Why (r4 profile, PERF.md): after the intersector kernel, a segment's
remaining work — emitter/termination masking, smooth-normal
interpolation, the three BSDF samplers, throughput/state updates — is
~50 XLA fusions over (3, R) vectors and (R,) per-ray scalars. The ops
themselves are cheap; the cost is LAYOUT: every (k, R) → (R,) slice
(and its transpose in reverse-mode AD) pays a T(k,128) → T(1024)
relayout pass, measured at ~60 ms of `slice_reduce_fusion` per 2-spp
gradient step — comparable to the intersection kernels themselves.
Inside one Pallas call the layouts are fixed and the whole chain runs
out of VMEM with zero relayouts and one dispatch.

Structure:

- `_epilogue_jnp` — the segment semantics as a pure jnp function on
  kernel-shaped blocks ((3, Rt) vectors, (1, Rt) scalars). This is the
  single source of truth for both directions.
- forward kernel: grid over ray tiles, body = `_epilogue_jnp`.
- backward: ``jax.vjp(_epilogue_jnp, ...)`` in plain XLA. A fully
  in-kernel backward (the vjp traced inside a second pallas_call) was
  built and REVERTED: Mosaic rejects the vjp's sublane reductions over
  offset layouts ("input layout must have zero offsets over dimensions
  that are being reduced") for the broadcast transposes this graph is
  full of.
- `segment_epilogue` — custom_vjp wrapper used by the integrator when
  ``TraceConfig.fused_epilogue`` is on.

Measured outcome (r4, PERF.md): the fused forward is throughput-NEUTRAL
on the headline config (8.44 vs 8.44 Msamples/s) — XLA's epilogue
fusions were already off the critical path in inference; the relayout
cost lives mostly in the gradient transposes this fusion cannot reach.
Kept as an off-by-default option: it is bit-identical (tested), one
dispatch instead of ~50, and the natural base for a future fused
backward once Mosaic lifts the reduction-layout restriction.

The RNG stays OUTSIDE (uniforms are inputs): random streams — and
therefore the estimator — are bit-identical to the unfused path.
Reference semantics implemented (identical to
`render.integrator.trace_radiance_soa`'s segment body):
CUTracer.cu:103-175 (fixed mode), rtx.hlsl:304-371 (RR mode),
two-sided diffuse flip, Phong/Blinn selection, Fresnel lobe, ε=0.01
origin offset.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_pallas import _BIG, _sds
from .sampling import (
    dot3,
    sample_fresnel,
    sample_hemi,
    sample_phong,
    sample_phong_reflect,
)


def _row(x):
    return x if x.ndim == 2 else x[None, :]


def _epilogue_jnp(
    pos, dir_, tput, result, active,  # (3,Rt)×4 + (1,Rt)
    tbg, shade,  # (4,Rt), (32,Rt)
    u1, u2, u_rr,  # (1,Rt)
    flags,  # (3, 1): [final_gather, do_rr, hard_kill] as f32
    *,
    mode: str,
    illum: float,
    eps_offset: float,
    refract_kd: bool,
    phong_model: str,
):
    """One segment's post-intersector semantics on kernel blocks.

    ``active`` is f32 (1, Rt) (>0 = live). Returns
    (new_pos, new_dir, new_tput, new_result, still_f32).
    All per-ray scalars stay (1, Rt) — fine INSIDE a kernel where
    there is no slice relayout to pay (the XLA-level experiment that
    regressed used (1, R) arrays end-to-end; see PERF.md r4).
    """
    hitf = tbg[3:4]
    t = tbg[0:1]
    beta, gamma = tbg[1:2], tbg[2:3]
    hitn = hitf > 0.0
    point = pos + (t * hitf) * dir_
    # ŷ constant via iota (a .at[].set would lower as an unsupported
    # scatter inside the TPU kernel).
    yhat = (
        jax.lax.broadcasted_iota(jnp.int32, (3, 1), 0) == 1
    ).astype(shade.dtype)
    n0 = jnp.where(hitn, shade[0:3], yhat)
    n1 = jnp.where(hitn, shade[3:6], yhat)
    n2 = jnp.where(hitn, shade[6:9], yhat)
    ka = shade[9:12]
    kd = shade[12:15]
    ks = shade[15:18]
    ns = shade[18:19]
    tr = shade[19:20]
    ni = jnp.where(hitn, shade[20:21], 1.0)

    miss = hitf == 0.0
    is_emit = (ka > 0.0).any(axis=0, keepdims=True)
    act = active > 0.0

    final_gather = flags[0:1, 0:1] > 0.0  # (1,1) broadcasts
    if mode == "rr":
        do_rr = flags[1:2, 0:1] > 0.0
        hard_kill = flags[2:3, 0:1] > 0.0
        p = jnp.max(tput, axis=0, keepdims=True)
        survive = p > u_rr
        rr_dead = do_rr & ~survive
        tput = jnp.where(
            do_rr & survive, tput / jnp.maximum(p, 1e-20), tput
        )
        dead_now = miss | rr_dead | hard_kill
    else:
        dead_now = miss

    emit_now = act & ~dead_now & (is_emit | final_gather)
    emitted = tput * ka * jnp.float32(illum)
    result = jnp.where(emit_now, emitted, result)
    still = act & ~dead_now & ~emit_now

    # --- scatter (ops/sampling.py shares the math; (1, Rt) rows) -----
    w0 = 1.0 - beta - gamma
    nrm = n0 * w0 + n1 * beta + n2 * gamma
    nn = jnp.sqrt(jnp.maximum(dot3(nrm, nrm)[None, :], 1.19209290e-7**2))
    normal = nrm / nn

    d_fresnel = sample_fresnel(u1[0], normal, dir_, tr[0], ni[0])
    phong_fn = (
        sample_phong_reflect if phong_model == "phong" else sample_phong
    )
    d_phong = phong_fn(u1[0], u2[0], normal, dir_, ns[0])
    d_hemi = sample_hemi(u1[0], u2[0], normal)
    flip = dot3(dir_, normal)[None, :] > 0.0
    d_diff = jnp.where(flip, -d_hemi, d_hemi)

    is_fresnel = tr > 0.0
    is_phong = ~is_fresnel & (ns > 1.0)
    new_dir = jnp.where(
        is_fresnel, d_fresnel, jnp.where(is_phong, d_phong, d_diff)
    )
    albedo_fresnel = kd if refract_kd else jnp.ones_like(kd)
    albedo = jnp.where(
        is_fresnel, albedo_fresnel, jnp.where(is_phong, ks, kd)
    )
    new_tput = jnp.where(still, tput * albedo, tput)
    new_pos = jnp.where(still, point + new_dir * eps_offset, pos)
    new_dir = jnp.where(still, new_dir, dir_)
    return new_pos, new_dir, new_tput, result, still.astype(jnp.float32)


def _fwd_kernel(*refs, mode, illum, eps_offset, refract_kd, phong_model):
    (pos, dirr, tput, res, act, tbg, shade, u1, u2, urr, flags,
     opos, odir, otput, ores, oact) = refs
    out = _epilogue_jnp(
        pos[:], dirr[:], tput[:], res[:], act[:], tbg[:], shade[:],
        u1[:], u2[:], urr[:], flags[:],
        mode=mode, illum=illum, eps_offset=eps_offset,
        refract_kd=refract_kd, phong_model=phong_model,
    )
    for ref, val in zip((opos, odir, otput, ores, oact), out):
        ref[:] = val


@functools.lru_cache(maxsize=None)
def _make_segment_epilogue(
    mode, illum, eps_offset, refract_kd, phong_model, ray_tile, interpret
):
    kw = dict(
        mode=mode, illum=illum, eps_offset=eps_offset,
        refract_kd=refract_kd, phong_model=phong_model,
    )

    def vec(k):  # (k, R) block spec over ray tiles
        return pl.BlockSpec(
            (k, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    def call_fwd(pos, dir_, tput, res, act, tbg, shade, u1, u2, urr, flags):
        R = pos.shape[1]
        grid = (R // ray_tile,)
        outs = pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid=grid,
            in_specs=[vec(3), vec(3), vec(3), vec(3), vec(1), vec(4),
                      vec(32), vec(1), vec(1), vec(1),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(vec(3), vec(3), vec(3), vec(3), vec(1)),
            out_shape=(
                _sds((3, R), jnp.float32, pos),
                _sds((3, R), jnp.float32, pos),
                _sds((3, R), jnp.float32, pos),
                _sds((3, R), jnp.float32, pos),
                _sds((1, R), jnp.float32, pos),
            ),
            interpret=interpret,
        )(pos, dir_, tput, res, act, tbg, shade, u1, u2, urr, flags)
        return outs

    def call_bwd(pos, dir_, tput, res, act, tbg, shade, u1, u2, urr,
                 flags, cts):
        # Plain-XLA vjp of the shared jnp body (see module docstring
        # for why this is not a second kernel).
        def g(p, d, tp, rs, tb, sh):
            o = _epilogue_jnp(
                p, d, tp, rs, act, tb, sh, u1, u2, urr, flags, **kw
            )
            return o[0], o[1], o[2], o[3]  # still is non-diff

        _, vjp = jax.vjp(g, pos, dir_, tput, res, tbg, shade)
        return vjp(cts)

    @jax.custom_vjp
    def f(pos, dir_, tput, res, act, tbg, shade, u1, u2, urr, flags):
        return call_fwd(pos, dir_, tput, res, act, tbg, shade, u1, u2,
                        urr, flags)

    def fwd(pos, dir_, tput, res, act, tbg, shade, u1, u2, urr, flags):
        out = f(pos, dir_, tput, res, act, tbg, shade, u1, u2, urr, flags)
        return out, (pos, dir_, tput, res, act, tbg, shade, u1, u2, urr,
                     flags)

    def bwd(resids, cts):
        (pos, dir_, tput, res, act, tbg, shade, u1, u2, urr, flags) = resids
        ct_pos, ct_dir, ct_tput, ct_res, _ = cts  # still: non-diff
        dpos, ddir, dtput, dres, dtbg, dshade = call_bwd(
            pos, dir_, tput, res, act, tbg, shade, u1, u2, urr, flags,
            (ct_pos, ct_dir, ct_tput, ct_res),
        )
        z1 = jnp.zeros_like(u1)
        return (dpos, ddir, dtput, dres, jnp.zeros_like(act), dtbg,
                dshade, z1, z1, z1, jnp.zeros_like(flags))

    f.defvjp(fwd, bwd)
    return f


def segment_epilogue(
    pos, dir_, tput, result, active,  # (3,R)×4, bool/f32 (R,) or (1,R)
    tbg, shade,  # (4,R), (32,R)
    u1, u2, u_rr,  # (R,) or (1,R) uniforms (u_rr ignored unless rr)
    flags,  # f32 (3, 1): [final_gather, do_rr, hard_kill]
    *,
    mode: str,
    illum: float,
    eps_offset: float,
    refract_kd: bool,
    phong_model: str,
    ray_tile: int = 2048,
    interpret: bool = False,
):
    """Fused segment epilogue. Returns (new_pos, new_dir, new_tput,
    new_result, still_bool). Pads the ray axis internally; bit-exact
    random streams (uniforms are inputs)."""
    R = pos.shape[1]
    act = _row(active.astype(jnp.float32))
    u1, u2, u_rr = _row(u1), _row(u2), _row(u_rr)
    ray_tile = min(ray_tile, -(-R // 128) * 128)
    pad = (-R) % ray_tile
    if pad:
        def padv(x, fill=0.0):
            return jnp.concatenate(
                [x, jnp.full((x.shape[0], pad), fill, x.dtype)], axis=1
            )
        pos, dir_, tput, result = map(padv, (pos, dir_, tput, result))
        tbg, shade, u1, u2, u_rr = map(padv, (tbg, shade, u1, u2, u_rr))
        act = padv(act)  # padding rays: dead
    fn = _make_segment_epilogue(
        mode, float(illum), float(eps_offset), bool(refract_kd),
        phong_model, ray_tile, interpret,
    )
    npos, ndir, ntput, nres, still = fn(
        pos, dir_, tput, result, act, tbg, shade, u1, u2, u_rr, flags
    )
    sl = slice(0, R)
    return (
        npos[:, sl], ndir[:, sl], ntput[:, sl], nres[:, sl],
        still[0, sl] > 0.0,
    )
