"""Headline benchmark: Cornell-box path-tracing throughput on TPU.

Matches the reference's benchmark workload (MC.docx results table,
BASELINE.md): scene-1 Cornell box at 800×600, fixed depth 7 + final
emission gather, brute-force intersection. The reference achieves
≈2.4 Msamples/s on a GTX 1070 (1000 spp in 200 s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N}
Diagnostics go to stderr.
"""

import json
import os
import sys
import time

import jax

BASELINE_MSAMPLES_S = 2.4  # GTX 1070, MC.docx results table


def main():
    from montecarlopathtracer_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    from montecarlopathtracer_tpu.models import cornell
    from montecarlopathtracer_tpu.render.integrator import TraceConfig
    from montecarlopathtracer_tpu.render.renderer import (
        Renderer,
        RenderSettings,
    )
    from montecarlopathtracer_tpu.utils.logging import RenderLog

    width = int(os.environ.get("BENCH_WIDTH", 800))
    height = int(os.environ.get("BENCH_HEIGHT", 600))
    spp_per_pass = int(os.environ.get("BENCH_SPP_PER_PASS", 4))
    passes = int(os.environ.get("BENCH_PASSES", 4))
    intersector = os.environ.get("BENCH_INTERSECTOR", "megakernel")
    # The fused Pallas path never materializes the [rays, tris]
    # intermediate, so the whole frame can be one wavefront; the lax
    # brute path needs ray tiles to bound it.
    default_chunk = 0 if intersector in ("fused", "megakernel") else 30000
    ray_chunk = int(os.environ.get("BENCH_RAY_CHUNK", default_chunk))

    if cornell.has_reference_scenes():
        scene, camera = cornell.load_reference_scene(1, width=width, height=height)
        scene_name = "scene01(ref)"
    else:
        scene, camera = cornell.cornell_box(
            with_mirror_sphere=True,
            with_glass_sphere=True,
            width=width,
            height=height,
        )
        scene_name = "cornell(procedural)"

    config = TraceConfig(
        mode="fixed",
        max_depth=7,
        illum=10.0,
        ray_chunk=ray_chunk,
        intersector=intersector,
    )
    settings = RenderSettings(
        width=width, height=height, spp_per_pass=spp_per_pass, seed=0
    )
    log = RenderLog(stream=sys.stderr)
    r = Renderer(scene, camera, config, settings, log=log)

    print(
        f"bench: {scene_name} T={scene.num_triangles} {width}x{height} "
        f"depth=7+1 spp/pass={spp_per_pass} passes={passes} "
        f"backend={jax.default_backend()}",
        file=sys.stderr,
    )

    import numpy as np

    def sync():
        # Force device→host data movement: over the remote-TPU tunnel
        # `block_until_ready` can return after dispatch, long before
        # the device finishes — only a fetch is a reliable fence.
        return float(np.asarray(r.film.color[0, 0, 0]))

    # Warmup (compile)
    t0 = time.perf_counter()
    r.render(1)
    sync()
    warmup_s = time.perf_counter() - t0
    print(f"warmup pass: {warmup_s:.1f}s", file=sys.stderr)

    from montecarlopathtracer_tpu.utils.profiling import trace

    # Time rendering, not logging: each per-pass log line fetches the
    # noise scalar from the device (~45 ms over the remote-TPU tunnel).
    log.enabled = False
    t0 = time.perf_counter()
    with trace(os.environ.get("BENCH_PROFILE_DIR")):
        r.render(passes)
    sync()
    dt = time.perf_counter() - t0
    log.enabled = True

    samples = width * height * spp_per_pass * passes
    msamples_s = samples / dt / 1e6
    # ray segments: depth 7 scatter + 1 final gather intersections
    mray_segments_s = msamples_s * 8

    print(
        f"{dt:.2f}s for {samples} samples → {msamples_s:.2f} Msamples/s "
        f"({mray_segments_s:.1f} Mray-segments/s)",
        file=sys.stderr,
    )

    # ---- fwd+bwd (the BASELINE north-star metric: grad throughput) ----
    # jax.grad of the pixel L2 loss through the differentiable (fused-
    # kernel) intersector; path-replay via jax.checkpoint. Params =
    # {Kd, Ka, vertices} (the BASELINE inverse-rendering configs 4-5).
    fwdbwd_msamples_s = None
    if os.environ.get("BENCH_GRAD", "1") != "0":
        import jax.numpy as jnp

        from montecarlopathtracer_tpu.diff.grad import (
            make_loss_fn,
            split_params,
        )

        gspp = int(os.environ.get("BENCH_GRAD_SPP", 2))
        # The megakernel is differentiable since round 3 (custom_vjp
        # with winner-recompute backward): the gradient render now runs
        # the same zero-gather forward kernel as inference, with the
        # per-ray gathers existing only in the backward pass.
        gcfg = TraceConfig(
            mode="fixed", max_depth=7, illum=10.0, ray_chunk=0,
            intersector=os.environ.get("BENCH_GRAD_INTERSECTOR", "megakernel"),
            # Store per-segment residuals instead of replaying the
            # kernel in the backward (measured faster than remat at
            # this frame size), and unroll the 8-segment scan so the
            # residuals are plain buffers instead of per-step
            # dynamic_update_slice stacking writes (PERF.md r4).
            remat_segments=False,
            unroll_segments=True,
        )
        target = jnp.zeros((height, width, 3), jnp.float32)
        loss_fn = make_loss_fn(
            scene, camera, target,
            width=width, height=height, spp=gspp, config=gcfg,
        )
        params = split_params(scene, ("mat_kd", "mat_ka", "vertices"))
        import jax as _jax

        vg = _jax.jit(_jax.value_and_grad(loss_fn))
        t0 = time.perf_counter()
        loss, grads = vg(params, _jax.random.key(7))
        float(loss)  # real fence: fetch, not block_until_ready
        print(
            f"grad compile+first step: {time.perf_counter() - t0:.1f}s "
            f"(loss {float(loss):.4f})",
            file=sys.stderr,
        )
        iters = int(os.environ.get("BENCH_GRAD_ITERS", 3))
        t0 = time.perf_counter()
        for i in range(iters):
            loss, grads = vg(params, _jax.random.key(8 + i))
        float(loss)  # real fence: fetch, not block_until_ready
        gdt = time.perf_counter() - t0
        gsamples = width * height * gspp * iters
        fwdbwd_msamples_s = gsamples / gdt / 1e6
        print(
            f"fwd+bwd: {gdt:.2f}s for {gsamples} samples → "
            f"{fwdbwd_msamples_s:.2f} Msamples/s "
            f"({fwdbwd_msamples_s * 8:.1f} Mray-segments/s fwd+bwd)",
            file=sys.stderr,
        )

    # ---- RR mode via the regenerating wavefront (render/regen.py) ----
    # The CLI auto default for mode=rr: dead lanes restart the next
    # sample in place. One fenced 32-spp pass; reported as an extra
    # field (the headline metric stays the fixed-mode scan pass for
    # round-to-round comparability).
    rr_regen_msamples_s = None
    if os.environ.get("BENCH_RR", "1") != "0":
        rr_cfg = TraceConfig(
            mode="rr", max_depth=7, illum=1.0, rr_depth=5,
            ray_chunk=0, intersector=intersector,
        )
        rr_settings = RenderSettings(
            width=width, height=height, spp_per_pass=32, seed=0,
            regen=True,
        )
        rr = Renderer(scene, camera, rr_cfg, rr_settings)
        rr.render(1)
        float(np.asarray(rr.film.color[0, 0, 0]))  # fence warmup
        t0 = time.perf_counter()
        rr.render(2)
        float(np.asarray(rr.film.color[0, 0, 0]))
        rr_dt = time.perf_counter() - t0
        rr_regen_msamples_s = width * height * 32 * 2 / rr_dt / 1e6
        print(
            f"rr regen (32 spp/pass): {rr_regen_msamples_s:.2f} "
            f"Msamples/s",
            file=sys.stderr,
        )

    record = {
        "metric": "cornell_800x600_depth7_brute_samples_throughput",
        "value": round(msamples_s, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(msamples_s / BASELINE_MSAMPLES_S, 3),
        "fwd_msamples_s": round(msamples_s, 3),
        "warmup_s": round(warmup_s, 1),
    }
    if rr_regen_msamples_s is not None:
        record["rr_regen_msamples_s"] = round(rr_regen_msamples_s, 3)
    if fwdbwd_msamples_s is not None:
        record["fwdbwd_msamples_s"] = round(fwdbwd_msamples_s, 3)
        record["fwdbwd_mray_segments_s"] = round(fwdbwd_msamples_s * 8, 2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
