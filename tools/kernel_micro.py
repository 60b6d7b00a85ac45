"""Roofline microbenchmarks for the selection kernel (run on TPU).

Isolates the cost components of one (ray tile × triangle chunk) step:

  matmul_only   — K-packed contraction + 1-read consumer (jnp.min)
  matmul_bf16   — same but bf16 output (half the p-write traffic)
  epilogue_only — v3 accept chain on resident f32 inputs (no matmul)
  v3_full       — contraction + accept chain (the real kernel step)

Each is timed standalone over the same [R × T] work so the deltas
attribute time to MXU, p-matrix VMEM traffic, and VPU epilogue, and a
ray-tile sweep measures per-grid-step fixed overhead. Informs the
production kernel's tile/chunk defaults; results quoted in PERF.md.

Usage: python tools/kernel_micro.py [--rays N] [--tris T] [--iters K]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=491520)  # 960 tiles of 512
    ap.add_argument("--tris", type=int, default=768)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    R, T = args.rays, args.tris
    rng = np.random.default_rng(0)
    _BIG = 3.0e38

    def timeit(fn, *a):
        out = jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters

    def report(name, dt, ray_tile, t_chunk):
        el = R * T
        print(
            json.dumps(
                {
                    "variant": name,
                    "ray_tile": ray_tile,
                    "t_chunk": t_chunk,
                    "us_per_step": round(
                        dt * 1e6 / (R // ray_tile) / max(T // t_chunk, 1), 3
                    ),
                    "ms": round(dt * 1e3, 3),
                    "gel_s": round(el / dt / 1e9, 2),  # 1e9 (ray,tri)/s
                }
            ),
            flush=True,
        )

    def make(body, ray_tile, t_chunk, K=48, out_dtype=jnp.int32):
        nc = T // t_chunk
        grid = (R // ray_tile, nc)

        @jax.jit
        def run(ws_k, rays_k):
            return pl.pallas_call(
                functools.partial(body, tc=t_chunk),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((K, 6 * t_chunk), lambda i, c: (0, c),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, ray_tile), lambda i, c: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, ray_tile), lambda i, c: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, R), out_dtype),
                scratch_shapes=[
                    pltpu.VMEM((1, ray_tile), jnp.float32),
                    pltpu.VMEM((1, ray_tile), jnp.int32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                ),
            )(ws_k, rays_k)

        return run

    # ---- kernel bodies -------------------------------------------------
    def body_matmul_only(ws_ref, rays_ref, out_ref, bt, bi, *, tc):
        ci = pl.program_id(1)
        p = jax.lax.dot_general(
            ws_ref[:], rays_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.min(p, axis=0)

        @pl.when(ci == 0)
        def _():
            bt[0, :] = m

        bt[0, :] = jnp.minimum(bt[0, :], m)

        @pl.when(ci == pl.num_programs(1) - 1)
        def _():
            out_ref[0, :] = bt[0, :].astype(jnp.int32)

    def body_matmul_bf16(ws_ref, rays_ref, out_ref, bt, bi, *, tc):
        ci = pl.program_id(1)
        p = jax.lax.dot_general(
            ws_ref[:], rays_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )
        m = jnp.min(p.astype(jnp.float32), axis=0)

        @pl.when(ci == 0)
        def _():
            bt[0, :] = m

        bt[0, :] = jnp.minimum(bt[0, :], m)

        @pl.when(ci == pl.num_programs(1) - 1)
        def _():
            out_ref[0, :] = bt[0, :].astype(jnp.int32)

    def _epilogue(p, tc, Rt, ci, bt, bi):
        opx = p[0 * tc: 1 * tc]
        opy = p[1 * tc: 2 * tc]
        q = p[2 * tc: 3 * tc]
        dpx = p[3 * tc: 4 * tc]
        dpy = p[4 * tc: 5 * tc]
        w = p[5 * tc: 6 * tc]
        r = pl.reciprocal(w, approx=True)
        r = r * (2.0 - w * r)
        t = q * r
        beta = opx + t * dpx
        gamma = opy + t * dpy
        m = jnp.minimum(jnp.minimum(beta, gamma), t)
        m = jnp.minimum(m, 1.0 - (beta + gamma))
        tm = jnp.where(m > 0.0, t, _BIG)
        c_min = jnp.min(tm, axis=0)
        col = jax.lax.broadcasted_iota(jnp.int32, (tc, Rt), 0)
        c_idx = jnp.min(
            jnp.where(tm <= c_min[None, :], col, jnp.int32(2**31 - 1)), axis=0
        ) + ci * tc
        better = c_min < bt[0, :]
        bt[0, :] = jnp.where(better, c_min, bt[0, :])
        bi[0, :] = jnp.where(better, c_idx, bi[0, :])

    def body_v3(ws_ref, rays_ref, out_ref, bt, bi, *, tc):
        ci = pl.program_id(1)
        Rt = out_ref.shape[1]

        @pl.when(ci == 0)
        def _():
            bt[0, :] = jnp.full((Rt,), _BIG, jnp.float32)
            bi[0, :] = jnp.full((Rt,), 2**31 - 1, jnp.int32)

        p = jax.lax.dot_general(
            ws_ref[:], rays_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        _epilogue(p, tc, Rt, ci, bt, bi)

        @pl.when(ci == pl.num_programs(1) - 1)
        def _():
            out_ref[0, :] = jnp.where(
                bt[0, :] < _BIG, bi[0, :], jnp.int32(-1)
            )

    def make_epilogue_only(ray_tile, t_chunk):
        """Accept chain on resident arrays — measures pure VPU+VMEM
        epilogue cost with no MXU work (p faked as a broadcast read)."""
        nc = T // t_chunk
        grid = (R // ray_tile, nc)

        def body(p_ref, out_ref, bt, bi, *, tc):
            ci = pl.program_id(1)
            Rt = out_ref.shape[1]

            @pl.when(ci == 0)
            def _():
                bt[0, :] = jnp.full((Rt,), _BIG, jnp.float32)
                bi[0, :] = jnp.full((Rt,), 2**31 - 1, jnp.int32)

            _epilogue(p_ref[:], tc, Rt, ci, bt, bi)

            @pl.when(ci == pl.num_programs(1) - 1)
            def _():
                out_ref[0, :] = jnp.where(
                    bt[0, :] < _BIG, bi[0, :], jnp.int32(-1)
                )

        @jax.jit
        def run(p_all):
            return pl.pallas_call(
                functools.partial(body, tc=t_chunk),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((6 * t_chunk, ray_tile),
                                 lambda i, c: (c, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, ray_tile), lambda i, c: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, R), jnp.int32),
                scratch_shapes=[
                    pltpu.VMEM((1, ray_tile), jnp.float32),
                    pltpu.VMEM((1, ray_tile), jnp.int32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                ),
            )(p_all)

        return run

    # ---- data ----------------------------------------------------------
    import jax.numpy as jnp  # noqa: F811

    ws = jnp.asarray(rng.normal(size=(48, 6 * T)), jnp.bfloat16)
    rays = jnp.asarray(rng.normal(size=(48, R)), jnp.bfloat16)

    for ray_tile in (512, 1024, 2048):
        for t_chunk in (256,) if T % 256 == 0 else (128,):
            run = make(body_v3, ray_tile, t_chunk)
            report("v3_full", timeit(run, ws, rays), ray_tile, t_chunk)

    ray_tile, t_chunk = 512, 256 if T % 256 == 0 else 128
    run = make(body_matmul_only, ray_tile, t_chunk)
    report("matmul_only_f32out", timeit(run, ws, rays), ray_tile, t_chunk)
    run = make(body_matmul_bf16, ray_tile, t_chunk)
    report("matmul_only_bf16out", timeit(run, ws, rays), ray_tile, t_chunk)

    # epilogue-only on a resident fake-p input sized [nc*6tc, R]... the
    # full p for all (tile, chunk) pairs would be R*T*6*4 bytes — too
    # big; reuse one p block for every grid step instead (index map
    # returns (c % nc_small, i % ...) not needed: use (0, 0)).
    nc = T // t_chunk

    def make_epilogue_shared(ray_tile, t_chunk):
        grid = (R // ray_tile, nc)

        def body(p_ref, out_ref, bt, bi, *, tc):
            ci = pl.program_id(1)
            Rt = out_ref.shape[1]

            @pl.when(ci == 0)
            def _():
                bt[0, :] = jnp.full((Rt,), _BIG, jnp.float32)
                bi[0, :] = jnp.full((Rt,), 2**31 - 1, jnp.int32)

            _epilogue(p_ref[:], tc, Rt, ci, bt, bi)

            @pl.when(ci == pl.num_programs(1) - 1)
            def _():
                out_ref[0, :] = jnp.where(
                    bt[0, :] < _BIG, bi[0, :], jnp.int32(-1)
                )

        @jax.jit
        def run(p_blk):
            return pl.pallas_call(
                functools.partial(body, tc=t_chunk),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((6 * t_chunk, ray_tile),
                                 lambda i, c: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, ray_tile), lambda i, c: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, R), jnp.int32),
                scratch_shapes=[
                    pltpu.VMEM((1, ray_tile), jnp.float32),
                    pltpu.VMEM((1, ray_tile), jnp.int32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                ),
            )(p_blk)

        return run

    p_blk = jnp.asarray(
        rng.normal(size=(6 * t_chunk, ray_tile)), jnp.float32
    )
    run = make_epilogue_shared(ray_tile, t_chunk)
    report("epilogue_only", timeit(run, p_blk), ray_tile, t_chunk)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
