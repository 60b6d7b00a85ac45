"""Command-line renderer — the framework's equivalent of the
reference's batch entry point (`CVMCTracer/CVMCTracer/main.cpp`) with
the compile-time constants promoted to flags (SURVEY.md §5 config gap).

Examples:
    # render the reference scene 1 like the CUDA backend (100 passes ×
    # 100 spp at 800×600, fixed depth 7, linear output):
    python -m montecarlopathtracer_tpu.cli --scene 1 --out result1.png

    # procedural Cornell with spheres, RR termination, gamma output:
    python -m montecarlopathtracer_tpu.cli --scene cornell-full \
        --mode rr --tonemap gamma --width 640 --height 480
"""

from __future__ import annotations

import argparse
import sys

from .models import cornell
from .render.integrator import TraceConfig
from .render.renderer import Renderer, RenderSettings
from .utils.logging import RenderLog


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="montecarlopathtracer_tpu",
        description="TPU-native differentiable Monte Carlo path tracer",
    )
    p.add_argument(
        "--scene",
        default="1",
        help="1/2/3 = reference scene (read-only mount), 'mcrt' = the "
        "MCRT backend's scene01 variant (per-triangle materials, π/4 "
        "camera), 'cornell' = procedural box, 'cornell-full' = "
        "procedural box with mirror + glass spheres, 'bunny' = large "
        "procedural benchmark scene, or a path to an .obj file",
    )
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=600)
    p.add_argument("--spp-per-pass", type=int, default=4)
    p.add_argument("--passes", type=int, default=25)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mode", choices=["fixed", "rr"], default="fixed")
    p.add_argument("--max-depth", type=int, default=7)
    p.add_argument("--rr-depth", type=int, default=5)
    p.add_argument("--illum", type=float, default=10.0)
    p.add_argument(
        "--ray-chunk",
        type=int,
        default=None,
        help="rays per wavefront tile (default: whole frame for the "
        "fused Pallas intersectors, 30000 for the lax paths, which "
        "materialize a [rays, tris] intermediate)",
    )
    p.add_argument(
        "--eye",
        type=float,
        nargs=3,
        default=None,
        metavar=("X", "Y", "Z"),
        help="camera position (overrides the scene's hardcoded camera)",
    )
    p.add_argument(
        "--lookat",
        type=float,
        nargs=3,
        default=None,
        metavar=("X", "Y", "Z"),
        help="camera look-at point (requires --eye)",
    )
    p.add_argument(
        "--up",
        type=float,
        nargs=3,
        default=(0.0, 1.0, 0.0),
        metavar=("X", "Y", "Z"),
        help="camera up vector (with --eye/--lookat)",
    )
    p.add_argument(
        "--fov",
        type=float,
        default=60.0,
        help="horizontal FOV in degrees (with --eye)",
    )
    p.add_argument(
        "--intersector",
        choices=["auto", "megakernel", "traverse", "fused", "brute", "kdtree"],
        default="auto",
        help="'auto' = on TPU, the traversal megakernel for large "
        "scenes and the streamed megakernel otherwise; brute elsewhere. "
        "'kdtree' builds the accelerator (native C++ builder when "
        "available) — a CPU correctness oracle; its per-lane while_loop "
        "walk faults the TPU runtime at render scale (PERF.md r4)",
    )
    p.add_argument(
        "--whole-segment",
        choices=["on", "off"],
        default="on",
        help="run each path segment as ONE Pallas kernel (intersect + "
        "sample + state update, with a fused backward) on the "
        "megakernel/traverse intersectors; 'off' = the split "
        "kernel+XLA-epilogue path (bit-identical, for ablation)",
    )
    p.add_argument(
        "--chunk-cull",
        choices=["auto", "on", "off"],
        default="auto",
        help="megakernel: Morton-order triangles and skip chunks no "
        "live ray reaches. 'auto' = ON for open/mid-size scenes "
        "(>1200 tris; measured scene2 7.4 vs 4.8, glossy 9.8 vs 7.2 "
        "Msamples/s), OFF for closed small boxes; ignored when the "
        "intersector resolves to 'traverse' (which subsumes it)",
    )
    p.add_argument(
        "--ray-sort",
        choices=["auto", "on", "off"],
        default="auto",
        help="re-sort bounce wavefronts by (origin Morton, direction "
        "octant) each segment for kernel-tile coherence; bit-exact. "
        "'auto' = on ONLY for the traversal intersector (huge scenes, "
        "where it is worth 2x) — at Cornell/glossy scale the sort "
        "costs more than the segments it helps (BENCH_SCENES r5)",
    )
    p.add_argument(
        "--ray-tile",
        type=int,
        default=0,
        help="rays per megakernel grid tile (multiple of 128; 0 = "
        "auto: 2048, or 512 with --chunk-cull on)",
    )
    p.add_argument(
        "--stream-chunk",
        type=int,
        default=0,
        help="triangles per streamed kernel chunk (multiple of 128; "
        "0 = auto)",
    )
    p.add_argument(
        "--phong-model",
        choices=["blinn", "phong"],
        default="blinn",
        help="specular sampler: 'blinn' = half-vector (the committed "
        "reference code); 'phong' = classic reflection lobe (MC.docx "
        "Figure 4 variant)",
    )
    p.add_argument(
        "--kernel-precision",
        choices=["highest", "high", "default"],
        default="highest",
        help="in-kernel matmul precision: 'highest' = 3-term split-bf16 "
        "(K=48, ~f32); 'high' = 2-term split (K=24, half the MXU work, "
        "gate-exact); 'default' = single-pass bf16 (fast, flips ~2%% "
        "of winners near triangle edges)",
    )
    p.add_argument(
        "--regen",
        choices=["auto", "on", "off"],
        default="auto",
        help="regenerating wavefront (render/regen.py): lanes restart "
        "the next sample the step their path dies, keeping ~100%% "
        "occupancy through RR tails (scene1 RR: 6.5 -> 10.7 "
        "Msamples/s at 4 spp/pass, 15.8 at 64). 'auto' = on for the "
        "megakernel intersector in rr mode, or in fixed mode at "
        ">=16 spp/pass; unbiased but not pass-exact vs the scan "
        "integrator for spp > 1",
    )
    p.add_argument("--tonemap", choices=["linear", "gamma"], default="linear")
    p.add_argument(
        "--accum",
        choices=["linear", "gamma"],
        default="linear",
        help="film accumulation space: 'linear' (CUDA estimator) or "
        "'gamma' (MCRT's gamma-space running mean, rtx.hlsl:400-404)",
    )
    p.add_argument("--out", default="result.png")
    p.add_argument("--step-dir", default=None, help="per-pass PNG dump dir")
    p.add_argument(
        "--preview",
        action="store_true",
        help="with --step-dir: keep an atomically-updated preview.png "
        "+ a self-refreshing index.html for a live progressive view "
        "(the reference's cvShowImage/swapchain capability)",
    )
    p.add_argument("--checkpoint", default=None, help="film checkpoint path")
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument(
        "--profile-dir",
        default=None,
        help="write a jax.profiler trace of the render here",
    )
    p.add_argument("--quiet", action="store_true")
    return p


def load_scene(name: str, width: int, height: int):
    if name in ("1", "2", "3"):
        return cornell.load_reference_scene(int(name), width=width, height=height)
    if name == "mcrt":
        return cornell.load_mcrt_scene(width=width, height=height)
    if name == "cornell":
        return cornell.cornell_box(width=width, height=height)
    if name == "cornell-full":
        return cornell.cornell_box(
            with_mirror_sphere=True,
            with_glass_sphere=True,
            width=width,
            height=height,
        )
    if name == "bunny":
        from .models.bunny import bunny_scene

        return bunny_scene(width=width, height=height)
    from .scene.scene import load_obj_scene
    from .scene.camera import camera_for_scene

    return load_obj_scene(name), camera_for_scene(1, width, height)


def resolve_ray_chunk(requested, intersector: str) -> int:
    """An explicit ``--ray-chunk`` always wins (including 30000, which an
    earlier version silently overrode). Default: whole-frame wavefront
    for the fused Pallas kernels (they never materialize [rays, tris]),
    30000-ray tiles for the lax paths (which do)."""
    if requested is not None:
        return requested
    return 0 if intersector in ("megakernel", "traverse", "fused") else 30000


def main(argv=None) -> int:
    import jax

    from .utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    scene, camera = load_scene(args.scene, args.width, args.height)
    if args.eye is not None:
        from .scene.camera import Camera
        import numpy as np

        lookat = (
            args.lookat
            if args.lookat is not None
            else tuple(np.asarray(args.eye) + np.asarray((0.0, 0.0, -1.0)))
        )
        camera = Camera.look(
            args.eye,
            tuple(np.asarray(lookat) - np.asarray(args.eye)),
            args.up,
            width=args.width,
            height=args.height,
            fov_x_deg=args.fov,
            jitter=camera.jitter,
        )
    elif args.lookat is not None:
        raise SystemExit("--lookat requires --eye")

    num_tris = int(scene.num_triangles)
    # The measured rule (render/integrator.py chunk_cull docstring +
    # BENCH_SCENES.json): chunk skipping loses slightly on a small
    # closed Cornell box — every tile reaches every chunk — and wins
    # everywhere bigger or more open. The traversal kernel subsumes the
    # cull path (same frustum cull + front-to-back early exit + DMA
    # skipping) and compiles in seconds where cull mode's 2-D-grid
    # kernel takes minutes, so 'auto' routes open/large scenes to it.
    open_or_large = num_tris > 1200

    intersector = args.intersector
    if intersector == "auto":
        if jax.default_backend() == "tpu":
            # Measured crossover (BENCH_SCENES r3): the traversal walk
            # loses to the plain streamed megakernel below ~10k
            # triangles (its per-segment sort + per-tile walk overhead
            # outweighs the chunk skipping) and wins big above it.
            intersector = "traverse" if num_tris >= 10000 else "megakernel"
        else:
            intersector = "brute"
    ray_chunk = resolve_ray_chunk(args.ray_chunk, intersector)

    def tristate(v, auto: bool) -> bool:
        return auto if v == "auto" else v == "on"

    # r5 auto policy, from the committed matrix (BENCH_SCENES): on
    # open mid-size scenes chunk-cull WITHOUT sorting wins big
    # (scene2 7.44 vs 4.82 plain, glossy 9.84 vs 7.23 — and sorting
    # these ruins it: glossy cull+sort 2.96, the per-segment sort
    # costs more than Cornell-scale segments); on closed small boxes
    # plain is best (scene1 10.36 vs cull 9.31); huge scenes take the
    # traversal walk, where per-segment sorting is decisively right
    # (bunny 0.67 sorted vs 0.35 unsorted).
    chunk_cull = tristate(
        args.chunk_cull, open_or_large
    ) and intersector == "megakernel"
    if args.chunk_cull == "on" and not chunk_cull:
        print(
            f"note: --chunk-cull on ignored (intersector={intersector!r} "
            "subsumes chunk skipping; cull applies to 'megakernel' only)",
            file=sys.stderr,
        )
    ray_sort = tristate(
        args.ray_sort, intersector == "traverse"
    ) and intersector in ("megakernel", "traverse")

    accel = None
    if intersector == "kdtree":
        import numpy as np

        from .accel.kdtree import build_flat_kdtree
        from .ops.traverse import KDArrays

        a, b, c = scene.triangle_vertices()
        flat = build_flat_kdtree(
            np.asarray(a), np.asarray(b), np.asarray(c),
            np.asarray(scene.tri_valid),
        )
        accel = KDArrays.from_flat(flat)

    config = TraceConfig(
        mode=args.mode,
        max_depth=args.max_depth,
        rr_depth=args.rr_depth,
        illum=args.illum,
        ray_chunk=ray_chunk,
        intersector=intersector,
        chunk_cull=chunk_cull,
        ray_sort=ray_sort,
        ray_tile=args.ray_tile,
        stream_chunk=args.stream_chunk,
        kernel_precision=args.kernel_precision,
        phong_model=args.phong_model,
        whole_segment=args.whole_segment == "on",
    )
    # Regen auto policy (measured r5, BENCH_SCENES): RR mode gains
    # 1.6-2.4x from wavefront regeneration (dead-lane refill) at any
    # spp. Fixed mode wins only at spp/pass >= 16 (fewer early
    # terminations to amortize the straggler tail): scene1 +7%,
    # glossy cull +25%. NEVER auto for traverse — regen ignores
    # ray_sort, and the traversal walk lives on sorted coherence
    # (bunny measured 0.34 vs 0.67 Msamples/s; the scan path's sort
    # already compacts dead lanes into skipped tiles there).
    regen = args.regen == "on" or (
        args.regen == "auto"
        and intersector == "megakernel"
        and (args.mode == "rr" or args.spp_per_pass >= 16)
    )
    settings = RenderSettings(
        width=args.width,
        height=args.height,
        spp_per_pass=args.spp_per_pass,
        passes=args.passes,
        seed=args.seed,
        tonemap=args.tonemap,
        accum=args.accum,
        step_dir=args.step_dir,
        preview=args.preview,
        checkpoint_path=args.checkpoint,
        checkpoint_every=args.checkpoint_every,
        regen=regen,
    )
    log = RenderLog(enabled=not args.quiet)
    r = Renderer(scene, camera, config, settings, log=log, accel=accel)
    from .utils.profiling import trace

    with trace(args.profile_dir):
        r.render()
    r.save_png(args.out)
    if not args.quiet:
        print(
            f"wrote {args.out} ({args.width}x{args.height}, "
            f"{float(r.film.weight):.0f} spp)",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
