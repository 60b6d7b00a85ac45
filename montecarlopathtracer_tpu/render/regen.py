"""Regenerating-wavefront renderer: dead lanes immediately restart the
next sample — the TPU answer to persistent-threads path tracing.

Why it exists: the reference's RR loop (rtx.hlsl:311-328) runs per
thread — a warp's threads retire independently and the SM schedules
fresh warps, so dead paths cost (almost) nothing. The static wavefront
scan (`render.integrator.trace_radiance_soa`) instead pays all
``3*rr_depth + 1`` segments at full width while the live fraction
decays from 1.0 to ~0.02: on scene1 RR measured 6.5 vs the fixed-mode
11.3 Msamples/s, with per-segment sort compaction measured 4× *worse*
at Cornell scale (one sort ≈ 4 segment kernels — PERF.md r5).

The regenerating wavefront keeps every lane busy instead: lane ``i``
is pinned to pixel ``i`` and traces that pixel's ``spp`` samples
back-to-back — the step a path terminates (miss / emitter / RR death /
hard kill), its radiance is accumulated into the lane's running sum
and the lane restarts with a fresh camera ray for the pixel's next
sample. One `lax.while_loop` runs whole-segment kernels
(`ops.segment_fused`, per-lane flags) until every lane has finished
its quota; occupancy stays ~100% for the bulk of the loop and decays
only over the final straggler tail. Lane↔pixel pinning means zero
scatters: the film contribution is a plain per-lane reshape.

Estimator: unbiased and deterministic (counter-based streams,
`ops.rng`), but not pass-exact vs the scan integrator for ``spp > 1``
— a lane's later samples consume the *step's* stream rather than a
per-sample-indexed one (iid either way). For ``spp == 1`` no lane ever
regenerates, every live lane sits at the same depth, and the streams
are indexed identically — the result is bit-identical to the scan
integrator (tested, tests/test_regen.py).

Depth predicates (final-gather / do_rr / hard-kill) become per-lane
rows because one wavefront mixes path depths; the whole-segment
kernels take them as an f32[3, R] VMEM input (``lane_flags``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from typing import Tuple

from ..scene.scene import ScenePack
from ..scene.camera import Camera
from ..ops.rng import stream_uniform
from .integrator import TraceConfig, _make_intersect_shade, _pcast_missing


def render_regen_planar(
    scene: ScenePack,
    camera: Camera,
    key: jax.Array,
    width: int,
    height: int,
    spp: int,
    config: TraceConfig,
    accel=None,
    y0=0,
    n_rows: int = 0,
    vary_axes: Tuple[str, ...] = (),
) -> jnp.ndarray:
    """Mean radiance over ``spp`` samples/pixel as planar
    f32[3, n_rows, W] for rows [y0, y0+n_rows) (default: whole frame).

    Requires a whole-segment Pallas intersector ("megakernel" or
    "traverse"). Inference-only (the loop is a `lax.while_loop`);
    gradient renders use the scan integrator. ``y0``/``n_rows``/
    ``vary_axes`` serve the SPMD row-band decomposition
    (`parallel.sharded.sharded_regen_pass`): lanes pin to the band's
    pixels and the loop init is pcast to the mesh axes the trace
    varies over (see `trace_radiance_soa`)."""
    if config.intersector not in ("megakernel", "traverse"):
        raise ValueError(
            "regen rendering needs intersector='megakernel' or "
            f"'traverse', got {config.intersector!r}"
        )
    if not n_rows:
        n_rows = height
    R = width * n_rows
    intersect_shade = _make_intersect_shade(scene, config, accel)
    whole = intersect_shade.whole
    lanes = jnp.arange(R)
    xs = lanes % width
    ys = lanes // width + y0
    rr = config.rr_depth
    n_seg = config.num_segments

    def draw_seg(step, k):
        # Stream ids match the scan integrator's ``seg_idx * 4 + k``
        # with seg_idx = step - 1: at spp=1 every live lane's depth
        # equals step - 1, so the whole render replays the scan
        # integrator's exact draws (the bit-equality test hook).
        return stream_uniform(key, (step - 1) * 4 + k, (R,))

    def camera_rays(step):
        # Jitter streams live in the same >=2^30 region as the scan
        # path's; step 0 (the initial wavefront) uses its exact ids.
        base = jnp.where(step == 0, 1 << 30, (1 << 30) + step * 2)
        jx = stream_uniform(key, base, (R,)) * 2.0 - 1.0
        jy = stream_uniform(key, base + 1, (R,)) * 2.0 - 1.0
        return camera.generate_rays_soa(xs, ys, jx, jy, width, height)

    pos0, dir0 = camera_rays(jnp.int32(0))
    zero3 = jnp.zeros((3, R), jnp.float32)
    init = (
        pos0,
        dir0,
        jnp.ones((3, R), jnp.float32),  # throughput
        zero3,  # per-path result
        zero3,  # per-lane radiance sum over completed samples
        jnp.ones((R,), bool),  # live
        jnp.zeros((R,), jnp.int32),  # depth within current path
        jnp.zeros((R,), jnp.int32),  # samples completed
        jnp.int32(1),  # step (1-based: segment at depth step-1 @ spp=1)
    )
    if vary_axes:
        init = jax.tree.map(lambda x: _pcast_missing(x, vary_axes), init)
    # Every path runs at most n_seg segments (hard kill / final
    # gather), so spp samples need at most spp * n_seg steps; the
    # bound is a backstop — `live` empties first.
    max_steps = spp * n_seg + 1

    def cond(c):
        return jnp.any(c[5]) & (c[8] < max_steps)

    def body(c):
        pos, dir_, tput, res, accum, live, depth, sidx, step = c
        u1 = draw_seg(step, 0)
        u2 = draw_seg(step, 1)
        zr = jnp.zeros((R,), jnp.float32)
        # The kernel consumes urr only in its (static) rr branch —
        # don't pay the draw in fixed mode (~0.1 ms/step, PERF.md).
        urr = draw_seg(step, 3) if config.mode == "rr" else zr
        if config.mode == "rr":
            do_rr = ((depth >= rr) & (depth < 3 * rr)).astype(
                jnp.float32
            )
            hard_kill = (depth >= 3 * rr).astype(jnp.float32)
            fg = zr
        else:
            fg = (depth == config.max_depth).astype(jnp.float32)
            do_rr = hard_kill = zr
        flags = jnp.stack([fg, do_rr, hard_kill])  # (3, R)

        npos, ndir, ntput, nres, still = whole(
            pos, dir_, tput, res, live, u1, u2, urr, flags, lane=True
        )
        ended = live & ~still
        accum = accum + jnp.where(ended[None, :], nres, 0.0)
        regen = ended & (sidx + 1 < spp)
        live = (live & still) | regen
        sidx = sidx + ended.astype(jnp.int32)
        depth = jnp.where(regen, 0, depth + 1)

        posr, dirr = camera_rays(step)
        rg = regen[None, :]
        pos = jnp.where(rg, posr, npos)
        dir_ = jnp.where(rg, dirr, ndir)
        tput = jnp.where(rg, 1.0, ntput)
        res = jnp.where(rg, 0.0, nres)
        return (pos, dir_, tput, res, accum, live, depth, sidx,
                step + 1)

    final = jax.lax.while_loop(cond, body, init)
    accum = final[4]
    return accum.reshape(3, n_rows, width) / jnp.float32(spp)


def render_regen_batch(
    scene: ScenePack,
    camera: Camera,
    key: jax.Array,
    width: int,
    height: int,
    spp: int,
    config: TraceConfig,
    accel=None,
) -> jnp.ndarray:
    """AoS wrapper over :func:`render_regen_planar`: f32[H, W, 3]."""
    return render_regen_planar(
        scene, camera, key, width, height, spp, config, accel
    ).transpose(1, 2, 0)
