"""Selection-kernel microbenchmark (run on the real TPU).

Times one intersection wavefront (R rays × T triangles → winner index +
refined hits) for each kernel variant × matmul precision, on a small
scene (Cornell, T≈900) and a large one (bunny, T≈82k). Prints a JSON
line per variant to stdout; drives the megakernel-default decision
(see TraceConfig.kernel_precision).

Usage: python tools/kernel_bench.py [--rays N] [--iters K] [--skip-large]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rays_for(scene, cam, R, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n1 = R // 2
    pix = rng.integers(0, 512 * 512, n1)
    o1, d1 = cam.generate_rays(
        jnp.asarray(pix % 512),
        jnp.asarray(pix // 512),
        jnp.asarray(rng.uniform(-1, 1, n1), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, n1), jnp.float32),
        512,
        512,
    )
    lo, hi = np.asarray(scene.aabb()[0]), np.asarray(scene.aabb()[1])
    n2 = R - n1
    o2 = rng.uniform(lo + 0.1, hi - 0.1, (n2, 3)).astype(np.float32)
    d2 = rng.normal(size=(n2, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    o = jnp.concatenate([o1, jnp.asarray(o2)], axis=0).T
    d = jnp.concatenate([d1, jnp.asarray(d2)], axis=0).T
    return o, d  # SoA [3, R]


def bench_variant(fn, iters):
    out = fn()  # compile + warmup
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=480_000)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--skip-large", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from montecarlopathtracer_tpu.models import cornell
    from montecarlopathtracer_tpu.models.bunny import bunny_scene
    from montecarlopathtracer_tpu.ops.intersect import triangle_transforms
    from montecarlopathtracer_tpu.ops.intersect_pallas import (
        pack_transforms,
        pack_transforms_fused,
        pack_transforms_stream,
        pack_geom_rows,
        pack_shading_table,
        nearest_shade,
        nearest_shade2,
        nearest_shade_streamed,
        morton_order,
        chunk_aabbs_padded,
        _divisor_chunk,
        _T_CHUNK,
    )

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    R = args.rays

    scenes = [("cornell", *cornell.cornell_box(
        with_mirror_sphere=True, with_glass_sphere=True, width=512, height=512
    ))]
    if not args.skip_large:
        scenes.append(("bunny", *bunny_scene(subdiv=6, width=512, height=512)))

    MODES = {"bf16": False, "bf16x3": True}

    for name, scene, cam in scenes:
        a, b, c = scene.triangle_vertices()
        m, m_a = jax.jit(triangle_transforms)(a, b, c)
        T = a.shape[0]
        tc = _divisor_chunk(T, _T_CHUNK)
        w = pack_transforms(m, m_a, scene.tri_valid)
        wf = pack_transforms_fused(m, m_a, scene.tri_valid, tc)
        geom = pack_geom_rows(m, m_a)
        table = pack_shading_table(scene)
        o, d = _rays_for(scene, cam, R)
        jax.block_until_ready((w, wf, geom, table, o, d))

        # streamed (v3) packings: several chunk sizes + a culled variant
        ws_by_tc = {
            stc: pack_transforms_stream(m, m_a, scene.tri_valid, stc)
            for stc in (128, 256, 512)
        }
        perm = morton_order(a, b, c, scene.tri_valid)
        ws_cull = pack_transforms_stream(
            m[perm], m_a[perm], scene.tri_valid[perm], 128
        )
        geom_cull = pack_geom_rows(m[perm], m_a[perm])
        table_cull = pack_shading_table(scene)[perm]
        clo, chi = chunk_aabbs_padded(a, b, c, scene.tri_valid, perm, 128)
        live = jnp.ones((R,), jnp.float32)
        jax.block_until_ready((ws_by_tc, ws_cull, clo, chi))

        for pname, exact in MODES.items():
            variants = []
            if T < 20_000:  # resident-w kernels: VMEM-capped
                dt1 = bench_variant(
                    lambda: nearest_shade(w, table, o, d, exact=exact),
                    args.iters,
                )
                dt2 = bench_variant(
                    lambda: nearest_shade2(
                        wf, geom, table, o, d, t_chunk=tc, exact=exact
                    ),
                    args.iters,
                )
                variants += [("v1", dt1), ("v2", dt2)]
            for stc, ws_s in ws_by_tc.items():
                dt3 = bench_variant(
                    lambda: nearest_shade_streamed(
                        ws_s, geom, table, o, d, t_chunk=stc, exact=exact
                    ),
                    args.iters,
                )
                variants.append((f"v3_tc{stc}", dt3))
            dt3c = bench_variant(
                lambda: nearest_shade_streamed(
                    ws_cull, geom_cull, table_cull, o, d, live, clo, chi,
                    t_chunk=128, cull=True, exact=exact,
                ),
                args.iters,
            )
            variants.append(("v3_cull_tc128", dt3c))
            for v, dt in variants:
                print(
                    json.dumps(
                        {
                            "scene": name,
                            "T": T,
                            "kernel": v,
                            "precision": pname,
                            "ms": round(dt * 1e3, 3),
                            "mray_segments_s": round(R / dt / 1e6, 2),
                        }
                    ),
                    flush=True,
                )
