"""Whole-segment kernel (ops/segment_fused.py) correctness.

Layers of evidence, all CPU/interpret:
- tuple-form samplers are BIT-IDENTICAL to ops/sampling.py (same ops,
  same order — rank-1 rows instead of (3, R) blocks);
- the whole-segment integrator path (megakernel and traverse, fixed
  and RR modes) is bit-identical to the split kernel+XLA path;
- gradients through the fused backward kernel match the split path's
  XLA vjp on a full render loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlopathtracer_tpu.models import cornell
from montecarlopathtracer_tpu.ops import sampling as S
from montecarlopathtracer_tpu.ops import segment_fused as F
from montecarlopathtracer_tpu.render.integrator import (
    TraceConfig,
    render_sample_batch,
)


def _rand(key, *shape):
    return jax.random.uniform(key, shape, jnp.float32)


def _unit(key, n):
    v = jax.random.normal(key, (3, n), jnp.float32)
    return v / jnp.linalg.norm(v, axis=0, keepdims=True)


def test_tuple_samplers_bit_identical():
    k = jax.random.key(0)
    ks = jax.random.split(k, 8)
    n = 257
    u1, u2 = _rand(ks[0], n), _rand(ks[1], n)
    normal = _unit(ks[2], n)
    indir = _unit(ks[3], n)
    ns = _rand(ks[4], n) * 100.0
    tr = _rand(ks[5], n)
    ni = 1.0 + _rand(ks[6], n)
    nt = (normal[0], normal[1], normal[2])
    it = (indir[0], indir[1], indir[2])

    for ref, rows in [
        (S.sample_hemi(u1, u2, normal), F._sample_hemi_t(u1, u2, nt)),
        (
            S.sample_phong(u1, u2, normal, indir, ns),
            F._sample_phong_t(u1, u2, nt, it, ns),
        ),
        (
            S.sample_phong_reflect(u1, u2, normal, indir, ns),
            F._sample_phong_reflect_t(u1, u2, nt, it, ns),
        ),
        (
            S.sample_fresnel(u1, normal, indir, tr, ni),
            F._sample_fresnel_t(u1, nt, it, tr, ni),
        ),
    ]:
        got = jnp.stack(rows, axis=0)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def _render_pair(config_kw, base_kw=None, width=48, height=36, depth=3):
    scene, camera = cornell.cornell_box(
        with_mirror_sphere=True, with_glass_sphere=True,
        width=width, height=height,
    )
    base = TraceConfig(
        max_depth=depth, ray_chunk=0, pallas_interpret=True,
        whole_segment=False,
        **(base_kw or {}), **{
            k: v for k, v in config_kw.items() if k != "whole_segment"
        },
    )
    fused = TraceConfig(
        max_depth=depth, ray_chunk=0, pallas_interpret=True, **config_kw
    )
    key = jax.random.key(7)
    a = render_sample_batch(scene, camera, key, width, height, base)
    b = render_sample_batch(scene, camera, key, width, height, fused)
    return np.asarray(a), np.asarray(b)


@pytest.mark.parametrize(
    "kw",
    [
        dict(whole_segment=True, intersector="megakernel"),
        dict(whole_segment=True, intersector="megakernel", mode="rr",
             illum=1.0),
        dict(whole_segment=True, intersector="megakernel",
             phong_model="phong"),
        dict(whole_segment=True, intersector="traverse", ray_sort=True),
        dict(whole_segment=True, intersector="traverse", mode="rr",
             illum=1.0, ray_sort=True),
        dict(whole_segment=True, intersector="megakernel",
             chunk_cull=True, ray_sort=True),
    ],
)
def test_whole_segment_bit_identical(kw):
    a, b = _render_pair(kw)
    np.testing.assert_array_equal(a, b)


def test_whole_segment_gradients_match():
    width = height = 32
    scene, camera = cornell.cornell_box(
        with_mirror_sphere=True, with_glass_sphere=True,
        width=width, height=height,
    )
    target = jnp.zeros((height, width, 3), jnp.float32)
    key = jax.random.key(3)

    def loss(params, cfg):
        import dataclasses
        s = dataclasses.replace(scene, **params)
        img = render_sample_batch(s, camera, key, width, height, cfg)
        return jnp.mean((img - target) ** 2)

    params = dict(
        mat_kd=scene.mat_kd, mat_ka=scene.mat_ka,
        vertices=scene.vertices,
    )
    com = dict(max_depth=3, ray_chunk=0, pallas_interpret=True,
               intersector="megakernel", remat_segments=False)
    g_base = jax.grad(loss)(params, TraceConfig(**com))
    g_full = jax.grad(loss)(
        params, TraceConfig(whole_segment=True, **com)
    )
    for k in params:
        ref, got = np.asarray(g_base[k]), np.asarray(g_full[k])
        scale = np.abs(ref).max() + 1e-12
        np.testing.assert_allclose(got, ref, atol=2e-5 * scale,
                                   err_msg=k)
        if k != "vertices":
            # Interior vertex gradients are exactly 0 by the
            # product-cancellation math (test_diff.py); material
            # gradients must be genuinely nonzero.
            assert np.abs(ref).max() > 0.0, f"zero reference grad {k}"


def test_whole_segment_traverse_gradients_match():
    width = height = 24
    scene, camera = cornell.cornell_box(width=width, height=height)
    target = jnp.zeros((height, width, 3), jnp.float32)
    key = jax.random.key(5)

    def loss(params, cfg):
        import dataclasses
        s = dataclasses.replace(scene, **params)
        img = render_sample_batch(s, camera, key, width, height, cfg)
        return jnp.mean((img - target) ** 2)

    params = dict(mat_kd=scene.mat_kd, mat_ka=scene.mat_ka)
    com = dict(max_depth=2, ray_chunk=0, pallas_interpret=True,
               intersector="traverse", remat_segments=False)
    g_base = jax.grad(loss)(params, TraceConfig(**com))
    g_full = jax.grad(loss)(
        params, TraceConfig(whole_segment=True, **com)
    )
    for k in params:
        ref, got = np.asarray(g_base[k]), np.asarray(g_full[k])
        scale = np.abs(ref).max() + 1e-12
        np.testing.assert_allclose(got, ref, atol=2e-5 * scale,
                                   err_msg=k)
