"""Boundary (visibility/silhouette) gradients via edge sampling.

With the reference's material model every geometric factor cancels
against its importance sampler, so path radiance is piecewise CONSTANT
in vertex positions: the interior (reparameterized) vertex gradient is
exactly zero (`diff.grad` module docstring). All geometry gradient
lives in visibility discontinuities. This module estimates that
boundary term for *primary* visibility with the edge-sampling estimator
of differentiable rasterization/path-tracing (Li et al. 2018 style,
restricted to camera edges), specialized to a rigid translation θ ∈ R³
of a marked triangle subset — enough for BASELINE config 5's "geometry
optimization: recover an object translation from a target image".

Estimator. For pixel value I_p (box filter over the pixel), a visible
edge crossing the pixel at screen position s with unit screen normal n̂
separates radiance L⁻ (the −n̂ side) from L⁺. If translating the
geometry by unit θ_k moves the edge's screen point with velocity v_k,
the boundary derivative is

    dI_p/dθ_k = Σ_edges ∫_pixel (L⁻(s) − L⁺(s)) · (v_k(s)·n̂(s)) dl

and dLoss/dθ_k = Σ_p (dLoss/dI_p) · dI_p/dθ_k. We Monte-Carlo the edge
integral: sample points on the marked mesh's edges ∝ projected screen
length, probe L∓ by tracing two rays through s ∓ ε·n̂, and weight by
the loss's image gradient at the containing pixel. Non-silhouette and
occluded edge samples self-cancel (both probes see the same surface →
L⁻ ≈ L⁺), so no explicit silhouette test is needed; interior mesh
edges are deduped so closed-surface silhouettes aren't double-counted.

TPU shape: everything is one vectorized wavefront — E edges projected
in parallel, N edge samples in parallel, 2N probe rays traced by the
ordinary `trace_radiance_soa` wavefront. No per-edge control flow.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..scene.scene import ScenePack
from ..scene.camera import Camera
from ..render.integrator import TraceConfig, trace_radiance_soa
from ..ops.rng import stream_uniform


def unique_edges(tri_v: np.ndarray, tri_mask: np.ndarray) -> np.ndarray:
    """Host-side: unique undirected edges (i32[E, 2]) of the masked
    triangles. Dedupe matters: a closed mesh shares every edge between
    two faces — sampling it twice would double the silhouette term."""
    tv = np.asarray(tri_v)[np.asarray(tri_mask)]
    e = np.concatenate([tv[:, [0, 1]], tv[:, [1, 2]], tv[:, [2, 0]]], axis=0)
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0).astype(np.int32)


def _project(camera: Camera, p: jnp.ndarray, width: int, height: int):
    """World point [3, N] → continuous pixel coordinates (sx, sy) plus
    the forward depth (for behind-camera rejection). Inverse of
    `Camera.generate_rays_soa`'s pixel→direction map."""
    d = p - camera.eye[:, None]
    df = jnp.sum(d * camera.forward[:, None], axis=0)
    safe = jnp.where(jnp.abs(df) < 1e-8, 1.0, df)
    xc = jnp.sum(d * camera.right[:, None], axis=0) / safe / camera.tan_half_x
    yc = jnp.sum(d * camera.up[:, None], axis=0) / safe / camera.tan_half_y
    sx = (xc + 1.0) * 0.5 * width
    sy = (1.0 - yc) * 0.5 * height
    return sx, sy, df


def boundary_grad_translation(
    scene: ScenePack,
    camera: Camera,
    edges: jnp.ndarray,  # i32[E, 2] vertex-index pairs (unique_edges)
    image_grad: jnp.ndarray,  # f32[H, W, 3] = dLoss/dI
    key: jax.Array,
    *,
    width: int,
    height: int,
    config: TraceConfig,
    n_samples: int = 4096,
    eps_px: float = 0.3,
    accel=None,
    vary_axes: Tuple[str, ...] = (),
) -> jnp.ndarray:
    """dLoss/dθ (f32[3]) for a unit translation θ of the edge mesh.

    ``image_grad`` is the loss's gradient w.r.t. the rendered image
    (e.g. 2(I−T)/(H·W·3) for mean-squared error), rendered/evaluated by
    the caller. ``eps_px`` is the probe offset in pixels: small enough
    to stay inside the pixel, large enough that the two probe rays
    straddle the edge despite fp projection error.

    Implemented as the row-sum of :func:`boundary_grad_vertices`: the
    estimator is linear in the vertex velocity field, and a rigid
    translation gives every vertex the same unit velocity.
    """
    gv = boundary_grad_vertices(
        scene, camera, edges, image_grad, key,
        width=width, height=height, config=config,
        n_samples=n_samples, eps_px=eps_px, accel=accel,
        vary_axes=vary_axes,
    )
    return jnp.sum(gv, axis=0)


def boundary_grad_vertices(
    scene: ScenePack,
    camera: Camera,
    edges: jnp.ndarray,  # i32[E, 2] vertex-index pairs (unique_edges)
    image_grad: jnp.ndarray,  # f32[H, W, 3] = dLoss/dI
    key: jax.Array,
    *,
    width: int,
    height: int,
    config: TraceConfig,
    n_samples: int = 4096,
    eps_px: float = 0.3,
    accel=None,
    vary_axes: Tuple[str, ...] = (),
) -> jnp.ndarray:
    """Per-vertex boundary gradient dLoss/dvertices (f32[V, 3]).

    ``vary_axes``: mesh axis names when called inside a `shard_map`
    body (each device then traces its own independent probe batch —
    see `parallel.sharded.make_geom_train_step`); threaded to
    `trace_radiance_soa` for the check_vma typecheck.

    Generalizes :func:`boundary_grad_translation` from a rigid θ ∈ R³
    to arbitrary vertex velocities: an edge sample at parameter u on
    edge (i0, i1) moves with world velocity (1−u)·v̇_{i0} + u·v̇_{i1},
    so each sample's screen-velocity term scatters into its two
    endpoint vertices with barycentric weights — two `scatter_add`s,
    no per-vertex loops. Vertices not on any sampled edge get exactly
    zero (matching the zero interior gradient of this material model).

    Identity used by the tests: summing rows of the result over the
    mesh's vertices equals `boundary_grad_translation` (the estimator
    is linear in the velocity field and a translation moves every
    vertex with the same unit velocity).
    """
    E = edges.shape[0]
    V = scene.vertices.shape[0]
    v = scene.vertices.T  # [3, V]
    p0 = v[:, edges[:, 0]]  # [3, E]
    p1 = v[:, edges[:, 1]]

    x0, y0, z0 = _project(camera, p0, width, height)
    x1, y1, z1 = _project(camera, p1, width, height)
    seg_len = jnp.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2)
    vis = (z0 > 1e-6) & (z1 > 1e-6)
    wgt = jnp.where(vis, seg_len, 0.0)
    total_len = jnp.sum(wgt)
    cdf = jnp.cumsum(wgt) / jnp.maximum(total_len, 1e-20)

    u_pick = stream_uniform(key, 11, (n_samples,))
    u_along = stream_uniform(key, 12, (n_samples,))
    eidx = jnp.searchsorted(cdf, u_pick).astype(jnp.int32)
    eidx = jnp.clip(eidx, 0, E - 1)

    sx0, sy0 = x0[eidx], y0[eidx]
    sx1, sy1 = x1[eidx], y1[eidx]
    sx = sx0 + (sx1 - sx0) * u_along
    sy = sy0 + (sy1 - sy0) * u_along
    tx, ty = sx1 - sx0, sy1 - sy0
    tlen = jnp.sqrt(tx * tx + ty * ty)
    safe_t = jnp.maximum(tlen, 1e-12)
    nx, ny = -ty / safe_t, tx / safe_t

    zeros = jnp.zeros((2 * n_samples,))
    xs = jnp.concatenate([sx + eps_px * nx, sx - eps_px * nx])
    ys = jnp.concatenate([sy + eps_px * ny, sy - eps_px * ny])
    pos3, dir3 = camera.generate_rays_soa(xs, ys, zeros, zeros, width, height)
    rad = trace_radiance_soa(
        scene, pos3, dir3, jax.random.fold_in(key, 13), config, accel,
        vary_axes,
    )
    l_plus = rad[:, :n_samples]
    l_minus = rad[:, n_samples:]

    p3 = p0[:, eidx] + (p1[:, eidx] - p0[:, eidx]) * u_along[None, :]

    def proj_xy(q):
        a, b, _ = _project(camera, q, width, height)
        return jnp.stack([a, b])

    px = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, width - 1)
    py = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, height - 1)
    wpix = image_grad[py, px, :].T  # [3, N]
    scal = jnp.sum(wpix * (l_minus - l_plus), axis=0)  # [N]
    valid = (tlen > 1e-9) & vis[eidx]
    scal = jnp.where(valid, scal, 0.0)

    # Per-axis screen velocity of the sample under a unit world
    # displacement (jvp is linear in the velocity, so the barycentric
    # factor scales it afterwards).
    per_axis = []
    for k in range(3):
        ek = jnp.zeros((3, 1)).at[k, 0].set(1.0)
        _, dv = jax.jvp(proj_xy, (p3,), (jnp.broadcast_to(ek, p3.shape),))
        v_dot_n = dv[0] * nx + dv[1] * ny  # [N]
        per_axis.append(scal * v_dot_n * total_len / n_samples)
    contrib = jnp.stack(per_axis, axis=1)  # [N, 3]

    i0 = edges[eidx, 0]
    i1 = edges[eidx, 1]
    out = jnp.zeros((V, 3), jnp.float32)
    out = out.at[i0].add(contrib * (1.0 - u_along)[:, None])
    out = out.at[i1].add(contrib * u_along[:, None])
    return out


def make_translation_problem(
    scene: ScenePack,
    camera: Camera,
    tri_mask: np.ndarray,  # bool[T] triangles that translate with θ
    target: jnp.ndarray,  # f32[H, W, 3]
    *,
    width: int,
    height: int,
    spp: int,
    config: TraceConfig,
    n_edge_samples: int = 4096,
):
    """Loss + gradient closure for recovering a rigid translation θ.

    Returns ``step(theta, key) -> (loss, grad3)``: renders the scene
    with the masked triangles' vertices shifted by θ, computes the
    mean-squared pixel loss against ``target``, and estimates dLoss/dθ
    with the boundary estimator (the interior term is exactly zero for
    this material model). Jitted end-to-end.
    """
    tm = np.asarray(tri_mask)
    vids = np.unique(np.asarray(scene.tri_v)[tm].ravel())
    vmask = np.zeros((scene.vertices.shape[0], 1), np.float32)
    vmask[vids] = 1.0
    vmask = jnp.asarray(vmask)
    edges = jnp.asarray(unique_edges(scene.tri_v, tm))

    from ..render.integrator import render_sample_batch
    import dataclasses

    def shifted(theta):
        return dataclasses.replace(
            scene, vertices=scene.vertices + vmask * theta[None, :]
        )

    @jax.jit
    def step(theta, key):
        s = shifted(theta)

        def one(acc, i):
            img = render_sample_batch(
                s, camera, jax.random.fold_in(key, i), width, height, config
            )
            return acc + img, None

        total, _ = jax.lax.scan(
            one, jnp.zeros((height, width, 3)), jnp.arange(spp)
        )
        img = total / spp
        loss = jnp.mean((img - target) ** 2)
        image_grad = 2.0 * (img - target) / (height * width * 3)
        grad = boundary_grad_translation(
            s,
            camera,
            edges,
            image_grad,
            jax.random.fold_in(key, 99),
            width=width,
            height=height,
            config=config,
            n_samples=n_edge_samples,
        )
        return loss, grad

    return step
