"""On-TPU gate + quick bench for the whole-segment kernel (r5).

Runs on the real chip: (1) Mosaic-compiles the whole-segment forward
and backward; (2) checks the whole-segment render against the split
megakernel path; (3) times fwd and fwd+bwd for both paths on the
headline config.

Usage: python tools/wseg_check.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-grad", action="store_true")
    args = ap.parse_args()

    from montecarlopathtracer_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from montecarlopathtracer_tpu.models import cornell
    from montecarlopathtracer_tpu.render.integrator import TraceConfig
    from montecarlopathtracer_tpu.render.renderer import (
        Renderer,
        RenderSettings,
    )

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    W, H = (400, 300) if args.quick else (800, 600)
    spp, passes = (2, 2) if args.quick else (4, 4)
    if cornell.has_reference_scenes():
        scene, cam = cornell.load_reference_scene(1, width=W, height=H)
    else:
        scene, cam = cornell.cornell_box(
            with_mirror_sphere=True, with_glass_sphere=True,
            width=W, height=H,
        )

    def sync(r):
        return float(np.asarray(r.film.color[0, 0, 0]))

    out = {}

    def run(name, cfg):
        settings = RenderSettings(width=W, height=H, spp_per_pass=spp, seed=0)
        r = Renderer(scene, cam, cfg, settings)
        t0 = time.perf_counter()
        r.render(1)
        sync(r)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r.render(passes)
        sync(r)
        dt = time.perf_counter() - t0
        ms = W * H * spp * passes / dt / 1e6
        out[name] = {
            "msamples_s": round(ms, 3), "compile_s": round(compile_s, 1),
        }
        print(f"{name}: {ms:.3f} Msamples/s (compile {compile_s:.1f}s)",
              file=sys.stderr)
        return np.asarray(r.film.color)

    base = TraceConfig(mode="fixed", max_depth=7, illum=10.0, ray_chunk=0,
                       intersector="megakernel")
    whole = TraceConfig(mode="fixed", max_depth=7, illum=10.0, ray_chunk=0,
                        intersector="megakernel", whole_segment=True)
    img_a = run("base_megakernel", base)
    img_b = run("whole_segment", whole)
    mad = float(np.abs(img_a - img_b).max())
    out["fwd_max_abs_diff"] = mad
    print(f"fwd max|diff|: {mad:.3e}", file=sys.stderr)

    if not args.skip_grad:
        from montecarlopathtracer_tpu.diff.grad import (
            make_loss_fn,
            split_params,
        )

        gspp = 2
        target = jnp.zeros((H, W, 3), jnp.float32)
        params = split_params(scene, ("mat_kd", "mat_ka", "vertices"))

        def grad_run(name, cfg):
            loss_fn = make_loss_fn(
                scene, cam, target, width=W, height=H, spp=gspp,
                config=cfg,
            )
            vg = jax.jit(jax.value_and_grad(loss_fn))
            t0 = time.perf_counter()
            loss, grads = vg(params, jax.random.key(7))
            float(loss)
            compile_s = time.perf_counter() - t0
            iters = 2 if args.quick else 3
            t0 = time.perf_counter()
            for i in range(iters):
                loss, grads = vg(params, jax.random.key(8 + i))
            float(loss)
            dt = (time.perf_counter() - t0)
            ms = W * H * gspp * iters / dt / 1e6
            out[name] = {
                "msamples_s": round(ms, 3),
                "compile_s": round(compile_s, 1),
            }
            print(
                f"{name}: {ms:.3f} Msamples/s fwd+bwd "
                f"(compile {compile_s:.1f}s, loss {float(loss):.5f})",
                file=sys.stderr,
            )
            return grads

        gbase = TraceConfig(
            mode="fixed", max_depth=7, illum=10.0, ray_chunk=0,
            intersector="megakernel", remat_segments=False,
            unroll_segments=True,
        )
        gwhole = TraceConfig(
            mode="fixed", max_depth=7, illum=10.0, ray_chunk=0,
            intersector="megakernel", whole_segment=True,
            remat_segments=False, unroll_segments=True,
        )
        ga = grad_run("grad_base", gbase)
        gb = grad_run("grad_whole", gwhole)
        for k in ga:
            a, b = np.asarray(ga[k]), np.asarray(gb[k])
            scale = np.abs(a).max() + 1e-12
            rel = float(np.abs(a - b).max() / scale)
            out[f"grad_rel_diff_{k}"] = rel
            print(f"grad {k}: max rel diff {rel:.3e}", file=sys.stderr)

    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "WSEG_CHECK.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
