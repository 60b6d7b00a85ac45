"""Multi-scene / multi-intersector benchmark sweep (run on TPU).

Covers VERDICT r1 items 1, 5 and 7: scene-2 and glossy throughput
(reference anchors: scene1 ≈2.4, scene2 ≈1.4 Msamples/s on a GTX 1070),
chunk-cull on/off on closed vs open vs large scenes, and the
acceleration-structure requirement — the culled kernel must *beat* the
brute megakernel on the ~82k-triangle bunny scene.

Writes BENCH_SCENES.json at the repo root; one JSON line per config on
stdout. Keep each config's pass budget small — the sweep compiles ~10
XLA programs.

Usage: python tools/bench_suite.py [--quick] [--only SUBSTR]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sync(film):
    """Force device→host data movement: on the remote-TPU tunnel,
    ``block_until_ready`` can return after dispatch, long before the
    device finishes — only an actual fetch is a reliable fence (the
    ~25 ms round trip is noise against multi-second render batches)."""
    import numpy as np

    return float(np.asarray(film.color[0, 0, 0]))


def run_config(name, scene, cam, config, width, height, spp, passes,
               accel=None, regen=False):
    from montecarlopathtracer_tpu.render.renderer import (
        Renderer,
        RenderSettings,
    )

    settings = RenderSettings(
        width=width, height=height, spp_per_pass=spp, seed=0,
        regen=regen,
    )
    r = Renderer(scene, cam, config, settings, accel=accel)
    t0 = time.perf_counter()
    r.render(1)  # compile + warmup
    _sync(r.film)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    r.render(passes)
    _sync(r.film)
    dt = time.perf_counter() - t0
    msamples_s = width * height * spp * passes / dt / 1e6
    rec = {
        "config": name,
        "tris": int(scene.num_triangles),
        "res": f"{width}x{height}",
        "spp_x_passes": f"{spp}x{passes}",
        "compile_s": round(compile_s, 1),
        "msamples_s": round(msamples_s, 3),
        "mray_segments_s": round(msamples_s * config.num_segments, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default="")
    ap.add_argument("--append", action="store_true",
                    help="merge results into an existing BENCH_SCENES.json "
                    "by config name (bank partial sweeps incrementally)")
    ap.add_argument("--kdtree", action="store_true", default=True,
                    help="include the lax KD-traversal oracle (slow; "
                    "on by default so the committed matrix has a real "
                    "number for it — VERDICT r2 weak #4)")
    ap.add_argument("--no-kdtree", dest="kdtree", action="store_false")
    args = ap.parse_args()

    import jax
    import numpy as np

    from montecarlopathtracer_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    from montecarlopathtracer_tpu.models import cornell, glossy
    from montecarlopathtracer_tpu.models.bunny import bunny_scene
    from montecarlopathtracer_tpu.render.integrator import TraceConfig

    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    def mk(intersector="megakernel", cull=False, sort=False, rt=0,
           mode="fixed", sc2=0):
        return TraceConfig(
            mode=mode, max_depth=7, illum=10.0 if mode == "fixed" else 1.0,
            rr_depth=5, ray_chunk=0,
            intersector=intersector, chunk_cull=cull, ray_sort=sort,
            ray_tile=rt, stream_chunk=sc2,
        )

    if cornell.has_reference_scenes():
        s1, c1 = cornell.load_reference_scene(1, width=800, height=600)
        s2, c2 = cornell.load_reference_scene(2, width=800, height=600)
    else:
        s1, c1 = cornell.cornell_box(
            with_mirror_sphere=True, with_glass_sphere=True,
            width=800, height=600,
        )
        s2, c2 = s1, c1
    sg, cg = glossy.glossy_steps(width=800, height=600)
    sb, cb = bunny_scene(subdiv=6, width=1024, height=1024)

    spp, passes = (2, 2) if args.quick else (4, 4)
    bunny_spp, bunny_passes = (1, 1) if args.quick else (1, 4)

    plan = [
        ("scene1_megakernel", s1, c1, mk(), 800, 600, spp, passes, None),
        # whole-segment ablation: the split kernel+XLA-epilogue path
        ("scene1_split_segment", s1, c1,
         dataclasses.replace(mk(), whole_segment=False),
         800, 600, spp, passes, None),
        ("scene1_cull", s1, c1, mk(cull=True), 800, 600, spp, passes, None),
        ("scene2_megakernel", s2, c2, mk(), 800, 600, spp, passes, None),
        ("scene2_cull", s2, c2, mk(cull=True), 800, 600, spp, passes, None),
        ("glossy_megakernel", sg, cg, mk(), 800, 600, spp, passes, None),
        ("glossy_cull", sg, cg, mk(cull=True), 800, 600, spp, passes, None),
        ("bunny_megakernel", sb, cb, mk(), 1024, 1024, bunny_spp, bunny_passes, None),
        ("bunny_cull", sb, cb, mk(cull=True), 1024, 1024, bunny_spp, bunny_passes, None),
        ("bunny_cull_sort", sb, cb, mk(cull=True, sort=True), 1024, 1024, bunny_spp, bunny_passes, None),
        ("bunny_cull_rt1024", sb, cb, mk(cull=True, rt=1024), 1024, 1024, bunny_spp, bunny_passes, None),
        ("bunny_cull_rt2048", sb, cb, mk(cull=True, rt=2048), 1024, 1024, bunny_spp, bunny_passes, None),
        ("glossy_cull_sort", sg, cg, mk(cull=True, sort=True), 800, 600, spp, passes, None),
        # v5 traversal megakernel (front-to-back early-exit walk)
        ("scene1_traverse", s1, c1, mk("traverse", sort=True), 800, 600, spp, passes, None),
        ("scene2_traverse", s2, c2, mk("traverse", sort=True), 800, 600, spp, passes, None),
        ("glossy_traverse", sg, cg, mk("traverse", sort=True), 800, 600, spp, passes, None),
        ("bunny_traverse", sb, cb, mk("traverse", sort=True), 1024, 1024, bunny_spp, bunny_passes, None),
        ("bunny_traverse_rt1024", sb, cb, mk("traverse", sort=True, rt=1024), 1024, 1024, bunny_spp, bunny_passes, None),
        ("bunny_traverse_rt2048", sb, cb, mk("traverse", sort=True, rt=2048), 1024, 1024, bunny_spp, bunny_passes, None),
        ("bunny_traverse_tc256", sb, cb, mk("traverse", sort=True, rt=1024, sc2=256), 1024, 1024, bunny_spp, bunny_passes, None),
        ("bunny_traverse_tc256_rt2048", sb, cb, mk("traverse", sort=True, rt=2048, sc2=256), 1024, 1024, bunny_spp, bunny_passes, None),
        ("bunny_traverse_tc512_rt2048", sb, cb, mk("traverse", sort=True, rt=2048, sc2=512), 1024, 1024, bunny_spp, bunny_passes, None),
        # RR termination mode (the MCRT backend's estimator; 16 segments
        # worst case) — VERDICT r2 missing #3
        ("scene1_rr_megakernel", s1, c1, mk(mode="rr"), 800, 600, spp, passes, None),
        # Regenerating wavefront (render/regen.py): dead lanes restart
        # the next sample immediately — the CLI auto default for RR.
        ("scene1_rr_regen", s1, c1, mk(mode="rr"), 800, 600, spp, passes, None, True),
        ("scene1_rr_regen_spp32", s1, c1, mk(mode="rr"), 800, 600, 32, 1, None, True),
        ("scene1_regen_spp16", s1, c1, mk(), 800, 600, 16, 1, None, True),
        ("glossy_cull_regen_spp16", sg, cg, mk(cull=True), 800, 600, 16, 1, None, True),
    ]
    kd_skip = None
    if args.kdtree and jax.default_backend() == "tpu":
        # Typed skip, not an error row: the per-lane KD walk is a
        # CPU-only oracle — on TPU it reproducibly faulted the runtime
        # (r4) and is now fenced before dispatch (integrator raises).
        kd_skip = {
            "config": "scene1_kdtree_lax",
            "skipped": "cpu-only oracle; fenced on TPU backend "
            "(faults the runtime — PERF.md r4). TPU tree path: "
            "intersector='traverse'.",
        }
    elif args.kdtree:
        from montecarlopathtracer_tpu.accel.kdtree import build_flat_kdtree
        from montecarlopathtracer_tpu.ops.traverse import KDArrays

        a, b, c = s1.triangle_vertices()
        flat = build_flat_kdtree(
            np.asarray(a), np.asarray(b), np.asarray(c),
            np.asarray(s1.tri_valid),
        )
        kd1 = KDArrays.from_flat(flat)
        plan.append(
            ("scene1_kdtree_lax", s1, c1, mk("kdtree"), 256, 192, 1, 1, kd1)
        )

    # fwd+bwd at scale (VERDICT r3 #3): gradient of an L2 pixel loss
    # through the traversal intersector on the 82k-tri bunny.
    def bunny_grad_row():
        import time as _t

        import jax as _jax
        import jax.numpy as jnp

        from montecarlopathtracer_tpu.diff.grad import (
            make_loss_fn,
            split_params,
        )

        cfg = TraceConfig(
            mode="fixed", max_depth=7, illum=10.0, ray_chunk=0,
            intersector="traverse", ray_sort=True,
            remat_segments=False, unroll_segments=True,
        )
        w = h = 512
        loss_fn = make_loss_fn(
            sb, cb, jnp.zeros((h, w, 3), jnp.float32),
            width=w, height=h, spp=1, config=cfg,
        )
        params = split_params(sb, ("mat_kd", "mat_ka"))
        vg = _jax.jit(_jax.value_and_grad(loss_fn))
        t0 = _t.perf_counter()
        loss, _ = vg(params, _jax.random.key(3))
        float(loss)
        compile_s = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        reps = 3
        for i in range(reps):
            loss, _ = vg(params, _jax.random.key(4 + i))
        float(loss)
        dt = (_t.perf_counter() - t0) / reps
        rec = {
            "config": "bunny_grad_fwdbwd",
            "tris": int(sb.num_triangles),
            "res": f"{w}x{h}",
            "spp_x_passes": "1x1 (fwd+bwd)",
            "compile_s": round(compile_s, 1),
            "msamples_s": round(w * h / dt / 1e6, 3),
            "mray_segments_s": round(w * h / dt / 1e6 * 8, 1),
        }
        print(json.dumps(rec), flush=True)
        return rec

    # Cull-mode rows last: their execution has hung the TPU worker in
    # some sessions (runtime flakiness); everything before them banks.
    plan = [
        row
        for _, row in sorted(
            enumerate(plan), key=lambda t: ("_cull" in t[1][0], t[0])
        )
    ]
    results = []
    if kd_skip is not None and (not args.only or args.only in kd_skip["config"]):
        print(json.dumps(kd_skip), flush=True)
        results.append(kd_skip)
    for row in plan:
        if args.only and args.only not in row[0]:
            continue
        try:
            results.append(run_config(*row))
        except Exception as e:  # keep sweeping; record the failure
            print(json.dumps({"config": row[0], "error": str(e)[:200]}),
                  flush=True)
            results.append({"config": row[0], "error": str(e)[:200]})
        _write(args, results)

    if not args.only or args.only in "bunny_grad_fwdbwd":
        try:
            results.append(bunny_grad_row())
        except Exception as e:
            print(json.dumps({"config": "bunny_grad_fwdbwd",
                              "error": str(e)[:200]}), flush=True)
            results.append({"config": "bunny_grad_fwdbwd",
                            "error": str(e)[:200]})
        _write(args, results)

    _write(args, results)
    return 0


def _write(args, results):
    import jax
    import json as _json

    path = os.path.join(ROOT, "BENCH_SCENES.json")
    if args.append and os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
        by_name = {r.get("config"): i for i, r in enumerate(out["results"])}
        for r in results:
            if r.get("config") in by_name:
                out["results"][by_name[r["config"]]] = r
            else:
                out["results"].append(r)
        out["backend"] = jax.default_backend()
    else:
        out = {
            "backend": jax.default_backend(),
            "reference_anchor": {
                "scene1_gtx1070_msamples_s": 2.4,
                "scene2_gtx1070_msamples_s": 1.4,
            },
            "results": results,
        }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    raise SystemExit(main())
