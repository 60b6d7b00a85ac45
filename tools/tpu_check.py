"""On-device kernel correctness gate.

Round-1 shipped a bf16 precision bug (commit 60dbdb2) that only showed
up on the real chip because all Pallas tests run `interpret=True` on
CPU. This gate closes that hole: it runs every compiled intersector
path on the *current backend* (the real TPU under the session env) and
asserts agreement against the lax oracle, then diffs a low-res render
against a CPU-computed golden.

Checks (each against `intersect_brute`, the f32-HIGHEST lax oracle):
  1. megakernel `nearest_shade`      — winner index + exact t/β/γ
  2. `intersect_fused`               — winner index + refined hits
  3. chunk-culled `nearest_shade_culled` — identical to megakernel
  4. KD traversal `intersect_kdtree` — winner index + t
  5. CPU-vs-device low-res render diff (the CPU golden is computed in a
     subprocess with JAX_PLATFORMS=cpu, then the device render must
     match it structurally)

Disagreeing winners must be *near-ties*: the chosen triangle's exact t
within 1e-3 relative of the oracle's. Exit code 0 + one JSON line on
stdout when everything passes; detail to stderr.

Usage:  python tools/tpu_check.py            # full gate (device + CPU golden)
        python tools/tpu_check.py --golden F # internal: write CPU render to F
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rays(scene, cam, n_primary=4096, n_random=4096, seed=0):
    """Primary rays + incoherent 'bounce-like' rays inside the box."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 64 * 64, n_primary)
    jx = jnp.asarray(rng.uniform(-1, 1, n_primary), jnp.float32)
    jy = jnp.asarray(rng.uniform(-1, 1, n_primary), jnp.float32)
    o1, d1 = cam.generate_rays(
        jnp.asarray(pix % 64), jnp.asarray(pix // 64), jx, jy, 64, 64
    )
    lo, hi = scene.aabb()
    lo, hi = np.asarray(lo), np.asarray(hi)
    o2 = rng.uniform(lo + 0.1, hi - 0.1, (n_random, 3)).astype(np.float32)
    d2 = rng.normal(size=(n_random, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    import jax.numpy as jnp

    o = jnp.concatenate([o1, jnp.asarray(o2)], axis=0)
    d = jnp.concatenate([d1, jnp.asarray(d2)], axis=0)
    return o, d


def _near_tie_check(name, hb, idx, t_refined, results, rtol=1e-3):
    tb = np.asarray(hb.tri_id)
    tk = np.asarray(idx)
    agree = (tb == tk).mean()
    miss_ok = bool(((tb < 0) == (tk < 0)).all())
    bad = (tb != tk) & (tb >= 0) & (tk >= 0)
    worst = 0.0
    if bad.any():
        t_b = np.asarray(hb.t)[bad]
        dt = np.abs(np.asarray(t_refined)[bad] - t_b)
        worst = float((dt / np.maximum(t_b, 1e-3)).max())
    ok = miss_ok and worst <= rtol and agree > 0.98
    results[name] = {
        "agree": round(float(agree), 6),
        "miss_status_agree": miss_ok,
        "worst_tie_rel_dt": round(worst, 8),
        "ok": bool(ok),
    }
    print(f"  {name}: {results[name]}", file=sys.stderr)
    return ok


def run_checks(write_golden: str | None = None) -> int:
    import jax
    import jax.numpy as jnp

    if write_golden:
        jax.config.update("jax_platforms", "cpu")

    from montecarlopathtracer_tpu.models import cornell
    from montecarlopathtracer_tpu.render.integrator import (
        TraceConfig,
        render_sample_batch_jit,
    )

    scene, cam = cornell.cornell_box(
        with_mirror_sphere=True, with_glass_sphere=True, width=64, height=64
    )

    render_cfg = TraceConfig(mode="fixed", max_depth=4, ray_chunk=0)

    def render(config):
        acc = None
        for i in range(4):
            img = render_sample_batch_jit(
                scene, cam, jax.random.key(100 + i),
                width=64, height=64, config=config,
            )
            acc = img if acc is None else acc + img
        return np.asarray(acc) / 4.0

    if write_golden:
        img = render(render_cfg)
        np.savez(write_golden, img=img)
        print(f"wrote CPU golden to {write_golden}", file=sys.stderr)
        return 0

    backend = jax.default_backend()
    print(f"backend: {backend}", file=sys.stderr)

    from montecarlopathtracer_tpu.ops.intersect import (
        intersect_brute,
        triangle_transforms,
    )
    from montecarlopathtracer_tpu.ops.intersect_pallas import (
        pack_transforms,
        pack_transforms_stream,
        pack_geom_rows,
        pack_rows_full,
        pack_shading_table,
        nearest_shade,
        nearest_shade_culled,
        nearest_shade_streamed,
        nearest_shade_full,
        morton_order,
        chunk_aabbs,
        chunk_aabbs_padded,
        intersect_fused,
        refine_hit,
    )

    a, b, c = scene.triangle_vertices()
    m, m_a = triangle_transforms(a, b, c)
    o, d = _rays(scene, cam)
    hb = jax.jit(intersect_brute)(m, m_a, scene.tri_valid, o, d)

    results = {}
    all_ok = True

    # 1. megakernel (exact K-packed selection — what the integrator runs)
    w = pack_transforms(m, m_a, scene.tri_valid)
    table = pack_shading_table(scene)
    idx, tbg, shade = nearest_shade(w, table, o.T, d.T, exact=True)
    all_ok &= _near_tie_check("megakernel", hb, idx, tbg[0], results)
    agree_hit = (np.asarray(hb.tri_id) == np.asarray(idx)) & (
        np.asarray(hb.tri_id) >= 0
    )
    t_err = np.abs(np.asarray(tbg[0]) - np.asarray(hb.t))[agree_hit]
    rel_t = float((t_err / np.maximum(np.asarray(hb.t)[agree_hit], 1e-3)).max())
    bg_err = float(
        np.maximum(
            np.abs(np.asarray(tbg[1]) - np.asarray(hb.beta)),
            np.abs(np.asarray(tbg[2]) - np.asarray(hb.gamma)),
        )[agree_hit].max()
    )
    results["megakernel_values"] = {
        "max_rel_t_err": round(rel_t, 8),
        "max_bg_err": round(bg_err, 8),
        "ok": bool(rel_t < 1e-4 and bg_err < 1e-4),
    }
    all_ok &= results["megakernel_values"]["ok"]
    print(f"  megakernel_values: {results['megakernel_values']}", file=sys.stderr)

    # 1b. streamed (v3) megakernel — the integrator's current default
    ws = pack_transforms_stream(m, m_a, scene.tri_valid, 256)
    geom = pack_geom_rows(m, m_a)
    idx_s, tbg_s, _ = nearest_shade_streamed(
        ws, geom, table, o.T, d.T, t_chunk=256, exact=True
    )
    all_ok &= _near_tie_check("streamed", hb, idx_s, tbg_s[0], results)

    # 1c. v4 self-contained megakernel (integrator default): winner +
    # in-kernel t/β/γ + exact one-hot shading row (no XLA epilogue)
    rows = pack_rows_full(m, m_a, scene, 256)
    idx_f, tbg_f, shade_f = nearest_shade_full(
        ws, rows, o.T, d.T, t_chunk=256, exact=True
    )
    all_ok &= _near_tie_check("mega_v4", hb, idx_f, tbg_f[0], results)
    hitm = (np.asarray(hb.tri_id) == np.asarray(idx_f)) & (
        np.asarray(hb.tri_id) >= 0
    )
    tid = np.maximum(np.asarray(hb.tri_id), 0)
    import jax.numpy as _jnp  # noqa: F401

    kd_ref = np.asarray(scene.mat_kd)[np.asarray(scene.tri_mat)[tid]]
    kd_err = float(
        np.abs(np.asarray(shade_f[12:15]).T[hitm] - kd_ref[hitm]).max()
    )
    bg_err_f = float(
        np.abs(np.asarray(tbg_f[1]) - np.asarray(hb.beta))[hitm].max()
    )
    # β tolerance 2e-3: the in-kernel fma inherits the split
    # contraction's ~1e-7 relative error amplified by t at grazing
    # hits; β only feeds barycentric normal interpolation.
    results["mega_v4_values"] = {
        "max_kd_err": round(kd_err, 9),
        "max_beta_err": round(bg_err_f, 9),
        "ok": bool(kd_err < 1e-6 and bg_err_f < 2e-3),
    }
    all_ok &= results["mega_v4_values"]["ok"]
    print(f"  mega_v4_values: {results['mega_v4_values']}", file=sys.stderr)

    # 1d. v4 at kernel_precision="high" (2-term split, K=24 — half the
    # MXU selection work). The gate DECIDES whether this tier is safe:
    # its l1·l1′ truncation is O(2⁻¹⁶) relative, 256× tighter than the
    # single-pass bf16 that round 2 caught flipping ~2% of winners.
    idx_h, tbg_h, shade_h = nearest_shade_full(
        ws, rows, o.T, d.T, t_chunk=256, exact=True, terms=2
    )
    all_ok &= _near_tie_check("mega_v4_high", hb, idx_h, tbg_h[0], results)
    kd_err_h = float(
        np.abs(np.asarray(shade_h[12:15]).T[hitm] - kd_ref[hitm]).max()
    )
    results["mega_v4_high_values"] = {
        "max_kd_err": round(kd_err_h, 9),
        "ok": bool(kd_err_h < 1e-6),
    }
    all_ok &= results["mega_v4_high_values"]["ok"]
    print(
        f"  mega_v4_high_values: {results['mega_v4_high_values']}",
        file=sys.stderr,
    )

    # 1e. whole-segment kernel (r5 default) — must be BIT-identical to
    # the split kernel+XLA-epilogue path on the device, and its fused
    # backward must reproduce the split path's XLA vjp.
    img_w = render(
        TraceConfig(
            mode="fixed", max_depth=4, ray_chunk=0,
            intersector="megakernel",
        )
    )
    img_s = render(
        TraceConfig(
            mode="fixed", max_depth=4, ray_chunk=0,
            intersector="megakernel", whole_segment=False,
        )
    )
    results["whole_segment_fwd"] = {
        "max_abs_diff": float(np.abs(img_w - img_s).max()),
        "ok": bool((img_w == img_s).all()),
    }
    all_ok &= results["whole_segment_fwd"]["ok"]
    print(f"  whole_segment_fwd: {results['whole_segment_fwd']}",
          file=sys.stderr)

    from montecarlopathtracer_tpu.diff.grad import (
        make_loss_fn,
        split_params,
    )

    params = split_params(scene, ("mat_kd", "mat_ka", "vertices"))
    gs = []
    for whole in (True, False):
        gcfg = TraceConfig(
            mode="fixed", max_depth=4, ray_chunk=0,
            intersector="megakernel", whole_segment=whole,
            remat_segments=False,
        )
        loss_fn = make_loss_fn(
            scene, cam, jnp.zeros((64, 64, 3)), width=64, height=64,
            spp=1, config=gcfg,
        )
        _, g = jax.value_and_grad(loss_fn)(params, jax.random.key(9))
        gs.append(g)
    grel = {}
    for k in params:
        a_, b_ = np.asarray(gs[0][k]), np.asarray(gs[1][k])
        grel[k] = float(np.abs(a_ - b_).max() / (np.abs(b_).max() + 1e-12))
    results["whole_segment_bwd"] = {
        "max_rel_diff": grel,
        "ok": bool(max(grel.values()) < 1e-5),
    }
    all_ok &= results["whole_segment_bwd"]["ok"]
    print(f"  whole_segment_bwd: {results['whole_segment_bwd']}",
          file=sys.stderr)

    # 2. fused
    hf = intersect_fused(m, m_a, scene.tri_valid, o, d)
    all_ok &= _near_tie_check("fused", hb, hf.tri_id, hf.t, results)

    # 3. chunk-culled (permuted axis: compare t only, indices are local)
    perm = morton_order(a, b, c, scene.tri_valid)
    wp = pack_transforms(m[perm], m_a[perm], scene.tri_valid[perm])
    tp = pack_shading_table(scene)[perm]
    clo, chi = chunk_aabbs(a, b, c, scene.tri_valid, perm, 128)
    live = jnp.ones((o.shape[0],), bool)
    idx_c, tbg_c, _ = nearest_shade_culled(
        wp, tp, clo, chi, o.T, d.T, live, t_chunk=128, exact=True
    )
    # map permuted winner back to the original axis for comparison
    idx_cg = jnp.where(idx_c >= 0, perm[jnp.maximum(idx_c, 0)], -1)
    all_ok &= _near_tie_check("chunk_culled", hb, idx_cg, tbg_c[0], results)

    # 3b. streamed + cull (the integrator's chunk_cull=True path)
    ws_p = pack_transforms_stream(m[perm], m_a[perm], scene.tri_valid[perm], 128)
    geom_p = pack_geom_rows(m[perm], m_a[perm])
    clo_s, chi_s = chunk_aabbs_padded(a, b, c, scene.tri_valid, perm, 128)
    idx_sc, tbg_sc, _ = nearest_shade_streamed(
        ws_p, geom_p, tp, o.T, d.T, live, clo_s, chi_s,
        t_chunk=128, cull=True, exact=True,
    )
    idx_scg = jnp.where(idx_sc >= 0, perm[jnp.maximum(idx_sc, 0)], -1)
    all_ok &= _near_tie_check(
        "streamed_culled", hb, idx_scg, tbg_sc[0], results
    )

    # 3c. v5 traversal megakernel (front-to-back early-exit walk) —
    # correctness must be independent of the ordering/culling
    # heuristics, so it faces the same near-tie gate as everything else.
    from montecarlopathtracer_tpu.ops.traverse_pallas import (
        nearest_shade_traverse,
    )

    rows_p = pack_rows_full(m[perm], m_a[perm], scene, 128, perm=perm)
    idx_tv, tbg_tv, shade_tv = nearest_shade_traverse(
        ws_p, rows_p, clo_s, chi_s, o.T, d.T, live, t_chunk=128,
        exact=True,
    )
    idx_tvg = jnp.where(idx_tv >= 0, perm[jnp.maximum(idx_tv, 0)], -1)
    all_ok &= _near_tie_check("traverse_v5", hb, idx_tvg, tbg_tv[0], results)
    hit_tv = (np.asarray(idx_tvg) == np.asarray(hb.tri_id)) & (
        np.asarray(hb.tri_id) >= 0
    )
    kd_err_tv = float(
        np.abs(np.asarray(shade_tv[12:15]).T[hit_tv] - kd_ref[hit_tv]).max()
    )
    results["traverse_v5_values"] = {
        "max_kd_err": round(kd_err_tv, 9),
        "ok": bool(kd_err_tv < 1e-6),
    }
    all_ok &= results["traverse_v5_values"]["ok"]
    print(
        f"  traverse_v5_values: {results['traverse_v5_values']}",
        file=sys.stderr,
    )

    # 4. KD traversal
    from montecarlopathtracer_tpu.accel.kdtree import build_flat_kdtree
    from montecarlopathtracer_tpu.ops.traverse import (
        KDArrays,
        intersect_kdtree,
    )

    flat = build_flat_kdtree(
        np.asarray(a), np.asarray(b), np.asarray(c), np.asarray(scene.tri_valid)
    )
    kd = KDArrays.from_flat(flat)
    hk = jax.jit(intersect_kdtree)(kd, m, m_a, scene.tri_valid, o, d)
    all_ok &= _near_tie_check("kdtree", hb, hk.tri_id, hk.t, results)

    # 5. CPU golden vs device render (megakernel path on device)
    with tempfile.TemporaryDirectory() as td:
        golden = os.path.join(td, "golden.npz")
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--golden", golden],
            check=True,
            env=env,
        )
        cpu_img = np.load(golden)["img"]
    dev_cfg = TraceConfig(
        mode="fixed",
        max_depth=4,
        ray_chunk=0,
        intersector="megakernel" if backend == "tpu" else "brute",
    )
    dev_img = render(dev_cfg)
    diff = np.abs(dev_img - cpu_img)
    # identical keys → identical paths up to fp/tie divergence at edges
    close = (diff < 0.02).all(axis=-1)
    f = 8
    down = lambda x: x.reshape(8, f, 8, f, 3).mean(axis=(1, 3))  # noqa: E731
    dmae = float(np.abs(down(dev_img) - down(cpu_img)).mean())
    results["cpu_vs_device_render"] = {
        "pix_close_frac": round(float(close.mean()), 4),
        "down8_mae": round(dmae, 6),
        "ok": bool(close.mean() > 0.97 and dmae < 0.01),
    }
    all_ok &= results["cpu_vs_device_render"]["ok"]
    print(
        f"  cpu_vs_device_render: {results['cpu_vs_device_render']}",
        file=sys.stderr,
    )

    # 6. Regenerating wavefront vs scan integrator, ON DEVICE: at
    # 1 spp no lane regenerates and the stream indexing coincides, so
    # the two schedulers must produce the SAME image (the per-lane-
    # flags kernel path vs the scalar-flags one). Fixed and RR modes.
    from montecarlopathtracer_tpu.render.integrator import (
        render_rows_planar,
    )
    from montecarlopathtracer_tpu.render.regen import render_regen_planar

    w, h = 256, 192
    rkey = jax.random.key(11)
    regen_ok = True
    regen_res = {}
    for rmode, rkw in (
        ("fixed", dict(max_depth=4)),
        ("rr", dict(rr_depth=2, illum=1.0)),
    ):
        rcfg = TraceConfig(
            mode=rmode, ray_chunk=0,
            intersector="megakernel" if backend == "tpu" else "brute",
            **rkw,
        )
        if rcfg.intersector != "megakernel":
            continue  # regen needs the Pallas path
        a_img = np.asarray(
            render_rows_planar(scene, cam, rkey, w, h, 0, h, rcfg)
        )
        b_img = np.asarray(
            render_regen_planar(scene, cam, rkey, w, h, 1, rcfg)
        )
        md = float(np.abs(a_img - b_img).max())
        regen_res[rmode] = md
        regen_ok &= md == 0.0
    if regen_res:
        results["regen_spp1_bit_identical"] = {
            "max_abs_diff": regen_res,
            "ok": bool(regen_ok),
        }
        all_ok &= results["regen_spp1_bit_identical"]["ok"]
        print(
            f"  regen_spp1_bit_identical: "
            f"{results['regen_spp1_bit_identical']}",
            file=sys.stderr,
        )

    out = {"backend": backend, "ok": bool(all_ok), "checks": results}
    print(json.dumps(out))
    return 0 if all_ok else 1


def kd_fault_repro() -> int:
    """Minimal repro of the KD-walk TPU runtime fault (VERDICT r4 weak
    #1) — OFF the default gate because it KILLS the device runtime.

    The per-lane stackless KD walk (`ops/traverse.py`) passes the
    small-shape correctness probe above (8k rays), but at render scale
    (≥~100k rays) the compiled program reproducibly takes down the TPU
    runtime with an UNAVAILABLE device error (2/2 fresh processes, r4).
    The faulting HLO is the vmapped per-lane `lax.while_loop` whose
    body gathers node fields per lane per iteration
    (`while(fori)·gather(kd.node_*)` — per-lane dynamic-slice streams
    at lane divergence). The integrator fences this path off the TPU
    backend; this probe exists so the fault stays reproducible and
    documented. Run explicitly: `python tools/tpu_check.py --kd-repro`.
    """
    import jax
    import numpy as np

    from montecarlopathtracer_tpu.models import cornell
    from montecarlopathtracer_tpu.accel.kdtree import build_flat_kdtree
    from montecarlopathtracer_tpu.ops.intersect import triangle_transforms
    from montecarlopathtracer_tpu.ops.traverse import (
        KDArrays,
        intersect_kdtree,
    )

    scene, cam = cornell.cornell_box(
        with_mirror_sphere=True, with_glass_sphere=True,
        width=256, height=192,
    )
    a, b, c = scene.triangle_vertices()
    m, m_a = triangle_transforms(a, b, c)
    flat = build_flat_kdtree(
        np.asarray(a), np.asarray(b), np.asarray(c),
        np.asarray(scene.tri_valid),
    )
    kd = KDArrays.from_flat(flat)
    o, d = _rays(scene, cam, n_primary=131072, n_random=131072)
    print("dispatching render-scale KD walk (expected: UNAVAILABLE "
          "device fault on TPU)...", file=sys.stderr)
    hk = jax.jit(intersect_kdtree)(kd, m, m_a, scene.tri_valid, o, d)
    print("survived:", int(np.asarray(hk.tri_id >= 0).sum()), "hits",
          file=sys.stderr)
    return 0


def main() -> int:
    if "--golden" in sys.argv:
        return run_checks(write_golden=sys.argv[sys.argv.index("--golden") + 1])
    if "--kd-repro" in sys.argv:
        return kd_fault_repro()
    return run_checks()


if __name__ == "__main__":
    raise SystemExit(main())
