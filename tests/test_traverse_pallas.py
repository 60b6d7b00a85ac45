"""Traversal megakernel (v5, ops/traverse_pallas.py) — interpret-mode
correctness vs the lax oracle, conservativeness of the host-side
frustum/ordering, and full-trace equality through the integrator.

The TPU capability under test is the reference's KD traversal
(MCRT/QuinEngine/Shader/rtx.hlsl:144-211) recast as per-tile
front-to-back chunk walking with early exit; correctness must never
depend on the ordering/culling heuristics, only speed does.
"""

import numpy as np
import jax
import jax.numpy as jnp

from montecarlopathtracer_tpu.models import cornell, glossy
from montecarlopathtracer_tpu.ops.intersect import (
    triangle_transforms,
    intersect_brute,
)
from montecarlopathtracer_tpu.ops import intersect_pallas as ip
from montecarlopathtracer_tpu.ops import traverse_pallas as tp


def _packs(scene, sc=128):
    a, b, c = scene.triangle_vertices()
    m, m_a = triangle_transforms(a, b, c)
    perm = ip.morton_order(a, b, c, scene.tri_valid)
    ws = ip.pack_transforms_stream(
        m[perm], m_a[perm], scene.tri_valid[perm], sc
    )
    rows = ip.pack_rows_full(m[perm], m_a[perm], scene, sc, perm=perm)
    clo, chi = ip.chunk_aabbs_padded(a, b, c, scene.tri_valid, perm, sc)
    return (m[perm], m_a[perm], scene.tri_valid[perm]), ws, rows, clo, chi


def _random_rays(key, R, spread=4.0, y_off=6.0):
    pos3 = jax.random.uniform(
        key, (3, R), minval=-spread, maxval=spread
    ).at[1].add(y_off)
    dir3 = jax.random.normal(jax.random.fold_in(key, 1), (3, R))
    dir3 = dir3 / jnp.linalg.norm(dir3, axis=0, keepdims=True)
    return pos3, dir3


def test_traverse_matches_oracle_with_dead_lanes():
    scene, _ = glossy.glossy_steps(width=64, height=48)
    (m, m_a, tv), ws, rows, clo, chi = _packs(scene)
    R = 1024
    pos3, dir3 = _random_rays(jax.random.key(2), R)
    live = (jax.random.uniform(jax.random.key(3), (R,)) > 0.15).astype(
        jnp.float32
    )

    idx, tbg, shade = tp.nearest_shade_traverse(
        ws, rows, clo, chi, pos3, dir3, live, t_chunk=128, interpret=True
    )
    hit = intersect_brute(m, m_a, tv, pos3.T, dir3.T)

    lv = np.asarray(live) > 0
    i5, ior = np.asarray(idx), np.asarray(hit.tri_id)
    assert (i5[lv] == ior[lv]).all(), (i5[lv] != ior[lv]).sum()
    hits = lv & (ior >= 0)
    np.testing.assert_allclose(
        np.asarray(tbg[0])[hits], np.asarray(hit.t)[hits], rtol=2e-4,
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(tbg[1])[hits], np.asarray(hit.beta)[hits], atol=3e-3
    )
    # hit flag must be 0 exactly on oracle misses (for live lanes)
    assert (np.asarray(tbg[3])[lv] == (ior[lv] >= 0)).all()


def test_tile_chunk_order_is_conservative():
    """Every chunk that contains ANY live ray's true nearest hit must
    appear in that tile's traversal list with tmin ≤ the hit t —
    otherwise the early exit could skip a real hit."""
    scene, _ = glossy.glossy_steps(width=64, height=48)
    (m, m_a, tv), ws, rows, clo, chi = _packs(scene)
    rt = 512
    R = 2 * rt
    pos3, dir3 = _random_rays(jax.random.key(9), R)
    live = jnp.ones((1, R), jnp.float32)
    order, tmins, _, n_reach = tp.tile_chunk_order(
        pos3, dir3, live, clo, chi, rt
    )
    hit = intersect_brute(m, m_a, tv, pos3.T, dir3.T)
    tri = np.asarray(hit.tri_id)
    t = np.asarray(hit.t)
    order, tmins, n_reach = map(np.asarray, (order, tmins, n_reach))
    for i in range(R // rt):
        lanes = slice(i * rt, (i + 1) * rt)
        tri_i, t_i = tri[lanes], t[lanes]
        in_list = order[i, : n_reach[i, 0]]
        pos_of = {int(c): p for p, c in enumerate(in_list)}
        for tid, th in zip(tri_i[tri_i >= 0], t_i[tri_i >= 0]):
            c = int(tid) // 128
            assert c in pos_of, (i, c)
            assert tmins[i, pos_of[c]] <= th + 1e-4, (
                i, c, tmins[i, pos_of[c]], th,
            )


def test_group_reach_mask_is_conservative():
    """r5 per-group reach lists: every chunk that contains a lane's
    true nearest hit must appear in the tile list with that lane's
    GROUP bit set in gmask — otherwise the kernel's group gate could
    skip a real hit."""
    scene, _ = glossy.glossy_steps(width=64, height=48)
    (m, m_a, tv), ws, rows, clo, chi = _packs(scene)
    rt, lg = 512, 128
    R = 2 * rt
    pos3, dir3 = _random_rays(jax.random.key(11), R)
    live = jnp.ones((1, R), jnp.float32)
    order, tmins, gmask, n_reach = tp.tile_chunk_order(
        pos3, dir3, live, clo, chi, rt, lane_group=lg
    )
    hit = intersect_brute(m, m_a, tv, pos3.T, dir3.T)
    tri = np.asarray(hit.tri_id)
    t = np.asarray(hit.t)
    order, tmins, gmask, n_reach = map(
        np.asarray, (order, tmins, gmask, n_reach)
    )
    for i in range(R // rt):
        in_list = order[i, : n_reach[i, 0]]
        pos_of = {int(c): p for p, c in enumerate(in_list)}
        for lane in range(rt):
            tid = tri[i * rt + lane]
            if tid < 0:
                continue
            c = int(tid) // 128
            g = lane // lg
            assert c in pos_of, (i, c)
            p = pos_of[c]
            assert gmask[i, p] >> g & 1, (i, c, g)
            assert tmins[i, p] <= t[i * rt + lane] + 1e-4


def test_traverse_trace_matches_brute_trace():
    """Full wavefront trace with intersector='traverse' (interpret) =
    brute trace — identical keys, identical sampling decisions."""
    from montecarlopathtracer_tpu.render.integrator import (
        TraceConfig,
        trace_radiance_jit,
    )

    scene, cam = cornell.cornell_box(width=8, height=8)
    R = 64
    pix = jnp.arange(R)
    o, d = cam.generate_rays(
        pix % 8, pix // 8, jnp.full((R,), 0.4), jnp.full((R,), 0.1), 8, 8
    )
    k = jax.random.key(5)
    cfg_b = TraceConfig(
        mode="fixed", max_depth=3, intersector="brute", ray_chunk=0
    )
    cfg_t = TraceConfig(
        mode="fixed",
        max_depth=3,
        intersector="traverse",
        ray_sort=True,
        pallas_interpret=True,
        ray_chunk=0,
    )
    rb = np.asarray(trace_radiance_jit(scene, o, d, k, config=cfg_b))
    rt = np.asarray(trace_radiance_jit(scene, o, d, k, config=cfg_t))
    close = np.isclose(rb, rt, rtol=1e-4, atol=1e-5).all(axis=-1)
    assert close.mean() >= 0.95, close.mean()


def test_traverse_gradients_match_brute():
    """jax.grad through intersector='traverse' must match the lax path
    (same custom_vjp scheme as the megakernel)."""
    from montecarlopathtracer_tpu.render.integrator import TraceConfig
    from montecarlopathtracer_tpu.diff.grad import render_image

    W = H = 12
    scene, cam = cornell.cornell_box(width=W, height=H)
    key = jax.random.key(5)
    cfgs = {
        "brute": TraceConfig(max_depth=2, ray_chunk=0),
        "traverse": TraceConfig(
            max_depth=2, ray_chunk=0, intersector="traverse",
            pallas_interpret=True,
        ),
    }
    grads = {}
    for name, cfg in cfgs.items():
        def f(scale):
            params = {"mat_kd": scene.mat_kd * scale}
            img = render_image(
                params, scene, cam, key, width=W, height=H, spp=2,
                config=cfg,
            )
            return jnp.mean(img)

        grads[name] = float(jax.grad(f)(jnp.float32(1.0)))
    assert grads["traverse"] > 0.0
    np.testing.assert_allclose(
        grads["traverse"], grads["brute"], rtol=2e-3
    )


def test_lane_group_gating_is_bit_identical():
    """Lane-group gating (skip column groups whose rays can't reach the
    chunk) must be bit-identical to the ungated walk — the per-lane
    reach bound makes skipping exact."""
    from montecarlopathtracer_tpu.ops.intersect import triangle_transforms
    from montecarlopathtracer_tpu.ops.intersect_pallas import (
        pack_transforms_stream,
        morton_order,
        chunk_aabbs_padded,
    )
    from montecarlopathtracer_tpu.ops.traverse_pallas import traverse_select

    scene, cam = cornell.cornell_box(
        with_mirror_sphere=True, with_glass_sphere=True, width=32, height=32
    )
    a, b, c = scene.triangle_vertices()
    m, m_a = triangle_transforms(a, b, c)
    perm = morton_order(a, b, c, scene.tri_valid)
    sc = 128
    ws = pack_transforms_stream(
        m[perm], m_a[perm], scene.tri_valid[perm], sc
    )
    clo, chi = chunk_aabbs_padded(a, b, c, scene.tri_valid, perm, sc)
    R = 32 * 32
    pix = jnp.arange(R)
    pos3, dir3 = cam.generate_rays_soa(
        pix % 32, pix // 32, jnp.zeros(R), jnp.zeros(R), 32, 32
    )
    base = traverse_select(
        ws, clo, chi, pos3, dir3, t_chunk=sc, ray_tile=512, interpret=True
    )
    for lg in (256, 128):
        out = traverse_select(
            ws, clo, chi, pos3, dir3, t_chunk=sc, ray_tile=512,
            interpret=True, lane_group=lg,
        )
        assert bool(jnp.all(out == base)), lg
    # walk_unroll processes the exact same visit set (the p < n_stop
    # compute gate) — bit-identical for any unroll factor.
    for wu in (2, 3):
        out = traverse_select(
            ws, clo, chi, pos3, dir3, t_chunk=sc, ray_tile=512,
            interpret=True, lane_group=128, walk_unroll=wu,
        )
        assert bool(jnp.all(out == base)), wu


def test_sort_every_is_estimator_neutral():
    """Amortized sorting (sort_every > 1) must be bit-identical to
    per-segment sorting and to the unsorted trace — rays carry their
    id and draw id-indexed streams regardless of order."""
    from montecarlopathtracer_tpu.render.integrator import (
        TraceConfig,
        trace_radiance_jit,
    )

    scene, cam = cornell.cornell_box(width=8, height=8)
    R = 64
    pix = jnp.arange(R)
    o, d = cam.generate_rays(
        pix % 8, pix // 8, jnp.full((R,), 0.2), jnp.full((R,), 0.6), 8, 8
    )
    k = jax.random.key(9)
    com = dict(
        mode="fixed", max_depth=3, intersector="traverse",
        pallas_interpret=True, ray_chunk=0,
    )
    base = np.asarray(
        trace_radiance_jit(scene, o, d, k, config=TraceConfig(**com))
    )
    for cfg in (
        TraceConfig(ray_sort=True, **com),
        TraceConfig(ray_sort=True, sort_every=2, **com),
        TraceConfig(ray_sort=True, sort_every=4, **com),
    ):
        out = np.asarray(trace_radiance_jit(scene, o, d, k, config=cfg))
        np.testing.assert_array_equal(out, base)
