"""Wavefront path-tracing integrator.

The reference's `sampleMC` is a per-thread sequential bounce loop with
data-dependent exits (CUTracer.cu:98-177, rtx.hlsl:304-371). The TPU
formulation is a *wavefront*: all R rays advance one path segment per
step of a `lax.scan` with static trip count; terminated lanes are
masked. Russian roulette becomes a masked kill + 1/p throughput
compensation, preserving the reference estimator exactly.

Both termination strategies are supported as one scan parameterized by a
static :class:`TraceConfig`:

- ``mode="fixed"`` — CUDA semantics: exactly ``max_depth`` scatter
  bounces, then one extra intersection that collects emission only
  (CUTracer.cu:103-175); emitters scale by ``illum`` (ILLUM=10,
  stdafx.h:45).
- ``mode="rr"`` — HLSL semantics: unbounded-until-miss loop with
  Russian roulette after ``rr_depth`` bounces (survive w.p.
  max(throughput), compensate by 1/p) and a hard kill at
  ``3*rr_depth`` (rtx.hlsl:311-328); no illum scale (rtx.hlsl:332).

Material/lobe semantics shared by both (CUTracer.cu:112-160):
- emitter iff any component of Ka > 0 → return throughput × Ka × illum;
- Tr > 0 → Fresnel refract/reflect; Kd multiplies throughput in the
  CUDA backend but not the HLSL one (rtx.hlsl:345) — ``refract_kd``;
- else Ns > 1 → Phong specular, throughput ×= Ks;
- else diffuse with two-sided normal flip (sample the hemisphere away
  from the incident side), throughput ×= Kd;
- next origin offset: hit + 0.01 × new_dir (CUTracer.cu:134).

The scan body is wrapped in `jax.checkpoint`: reverse-mode AD replays
each segment instead of storing the per-segment intersection
intermediates — the path-replay gradient strategy, exact because all
randomness is counter-based (`ops.rng`).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..scene.scene import ScenePack
from ..scene.camera import Camera
from ..ops.rng import stream_uniform
from ..ops.sampling import sample_hemi, sample_phong, sample_fresnel
from ..ops.intersect import triangle_transforms, intersect_brute


@dataclasses.dataclass(frozen=True)
class TraceConfig:
    """Static integrator configuration (hashable → usable as a jit
    static argument)."""

    mode: str = "fixed"  # "fixed" (CUDA) or "rr" (HLSL)
    max_depth: int = 7  # scatter bounces in "fixed" mode (CUTracer.cu:212)
    rr_depth: int = 5  # RR start in "rr" mode (rtx.hlsl:400)
    illum: float = 10.0  # emitter scale (ILLUM, stdafx.h:45); 1.0 for HLSL
    eps_offset: float = 0.01  # self-intersection offset (CUTracer.cu:134)
    refract_kd: bool = True  # CUDA multiplies Kd on refract; HLSL doesn't
    t_chunk: int = 0  # triangle chunk for the brute intersector (0 = all)
    ray_chunk: int = 8192  # rays per wavefront tile (bounds the [R, T]
    # intersection intermediate; 0 = whole frame in one wavefront)
    intersector: str = "brute"  # "brute" (lax oracle), "fused" (Pallas
    # megakernel), or "kdtree" (stackless traversal; needs `accel`)
    pallas_interpret: bool = False  # interpreter mode for CPU tests

    @property
    def num_segments(self) -> int:
        """Total intersections per path (static scan length)."""
        if self.mode == "fixed":
            return self.max_depth + 1  # + final emission gather
        elif self.mode == "rr":
            return 3 * self.rr_depth + 1  # hard kill boundary
        raise ValueError(f"unknown mode {self.mode!r}")


def _gather_material(scene: ScenePack, tri_id: jnp.ndarray):
    """Per-ray material fields for hit triangles (tri_id clamped; callers
    mask misses)."""
    tid = jnp.maximum(tri_id, 0)
    mid = scene.tri_mat[tid]
    return dict(
        ka=scene.mat_ka[mid],
        kd=scene.mat_kd[mid],
        ks=scene.mat_ks[mid],
        ns=scene.mat_ns[mid],
        tr=scene.mat_tr[mid],
        ni=scene.mat_ni[mid],
    )


def _shading_normal(scene: ScenePack, tri_id, beta, gamma):
    """Smooth normal: barycentric interpolation of per-corner normals,
    normalized (CUTracer.cu:122-126)."""
    tid = jnp.maximum(tri_id, 0)
    n0 = scene.normals[scene.tri_n[tid, 0]]
    n1 = scene.normals[scene.tri_n[tid, 1]]
    n2 = scene.normals[scene.tri_n[tid, 2]]
    n = (
        n0 * (1.0 - beta - gamma)[:, None]
        + n1 * beta[:, None]
        + n2 * gamma[:, None]
    )
    norm = jnp.sqrt(jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True), 1e-20))
    return n / norm


def trace_radiance(
    scene: ScenePack,
    origins: jnp.ndarray,  # f32[R, 3]
    dirs: jnp.ndarray,  # f32[R, 3] unit
    key: jax.Array,
    config: TraceConfig,
    accel=None,
) -> jnp.ndarray:
    """Estimate radiance along R rays. Returns f32[R, 3].

    ``accel`` is a `ops.traverse.KDArrays` when
    ``config.intersector == "kdtree"``; unused otherwise.
    """
    R = origins.shape[0]
    a, b, c = scene.triangle_vertices()
    m, m_a = triangle_transforms(a, b, c)
    t_chunk = config.t_chunk if config.t_chunk > 0 else None

    if config.intersector == "brute":
        def intersect(pos, dir_):
            return intersect_brute(
                m, m_a, scene.tri_valid, pos, dir_, t_chunk=t_chunk
            )
    elif config.intersector == "fused":
        from ..ops.intersect_pallas import intersect_fused

        def intersect(pos, dir_):
            return intersect_fused(
                m,
                m_a,
                scene.tri_valid,
                pos,
                dir_,
                interpret=config.pallas_interpret,
            )
    elif config.intersector == "kdtree":
        if accel is None:
            raise ValueError("intersector='kdtree' requires accel=KDArrays")
        from ..ops.traverse import intersect_kdtree

        def intersect(pos, dir_):
            return intersect_kdtree(accel, m, m_a, scene.tri_valid, pos, dir_)
    else:
        raise ValueError(f"unknown intersector {config.intersector!r}")

    illum = jnp.float32(config.illum)
    n_seg = config.num_segments

    def segment(carry, seg_idx):
        pos, dir_, tput, result, active = carry

        hit = intersect(pos, dir_)
        miss = hit.tri_id < 0

        mat = _gather_material(scene, hit.tri_id)
        is_emit = jnp.any(mat["ka"] > 0.0, axis=-1)

        if config.mode == "rr":
            # Hard kill at 3*rr_depth bounces (rtx.hlsl:313-316): rays
            # still active at the last segment contribute nothing.
            hard_kill = seg_idx >= 3 * config.rr_depth
            # Russian roulette once past rr_depth (rtx.hlsl:317-328).
            do_rr = (seg_idx >= config.rr_depth) & ~hard_kill
            p = jnp.max(tput, axis=-1)
            u_rr = stream_uniform(key, seg_idx * 4 + 3, (R,))
            survive = p > u_rr
            rr_dead = do_rr & ~survive
            tput = jnp.where(
                (do_rr & survive)[:, None],
                tput / jnp.maximum(p, 1e-20)[:, None],
                tput,
            )
            dead_now = miss | rr_dead | hard_kill
        else:
            # Fixed mode: the final segment gathers emission only
            # (CUTracer.cu:162-175) — handled below via `final_gather`.
            dead_now = miss

        final_gather = (
            jnp.broadcast_to(seg_idx == config.max_depth, (R,))
            if config.mode == "fixed"
            else jnp.zeros((R,), bool)
        )

        # Emitter hit → terminate with throughput × Ka × illum
        # (CUTracer.cu:112-120). In the final gather segment of fixed
        # mode, *any* hit terminates with Ka×illum (zero for
        # non-emitters), matching CUTracer.cu:162-175.
        emit_now = active & ~dead_now & (is_emit | final_gather)
        emitted = tput * mat["ka"] * illum
        result = jnp.where(emit_now[:, None], emitted, result)

        still = active & ~dead_now & ~emit_now

        # --- scatter ---------------------------------------------------------
        normal = _shading_normal(scene, hit.tri_id, hit.beta, hit.gamma)
        u1 = stream_uniform(key, seg_idx * 4 + 0, (R,))
        u2 = stream_uniform(key, seg_idx * 4 + 1, (R,))

        d_fresnel = sample_fresnel(u1, normal, dir_, mat["tr"], mat["ni"])
        d_phong = sample_phong(u1, u2, normal, dir_, mat["ns"])
        d_hemi = sample_hemi(u1, u2, normal)
        # Two-sided diffuse: flip to the hemisphere opposite the
        # incident direction (CUTracer.cu:151-158).
        flip = jnp.sum(dir_ * normal, axis=-1) > 0.0
        d_diff = jnp.where(flip[:, None], -d_hemi, d_hemi)

        is_fresnel = mat["tr"] > 0.0
        is_phong = ~is_fresnel & (mat["ns"] > 1.0)
        new_dir = jnp.where(
            is_fresnel[:, None],
            d_fresnel,
            jnp.where(is_phong[:, None], d_phong, d_diff),
        )
        albedo_fresnel = mat["kd"] if config.refract_kd else jnp.ones_like(mat["kd"])
        albedo = jnp.where(
            is_fresnel[:, None],
            albedo_fresnel,
            jnp.where(is_phong[:, None], mat["ks"], mat["kd"]),
        )

        new_tput = jnp.where(still[:, None], tput * albedo, tput)
        new_pos = jnp.where(
            still[:, None], hit.point + new_dir * config.eps_offset, pos
        )
        new_dir = jnp.where(still[:, None], new_dir, dir_)
        new_active = still

        return (new_pos, new_dir, new_tput, result, new_active), None

    init = (
        origins,
        dirs,
        jnp.ones((R, 3), jnp.float32),
        jnp.zeros((R, 3), jnp.float32),
        jnp.ones((R,), bool),
    )
    (pos, dir_, tput, result, active), _ = jax.lax.scan(
        jax.checkpoint(segment), init, jnp.arange(n_seg)
    )
    return result


def render_rows(
    scene: ScenePack,
    camera: Camera,
    key: jax.Array,
    width: int,
    height: int,
    y0,
    n_rows: int,
    config: TraceConfig,
    accel=None,
) -> jnp.ndarray:
    """One sample per pixel for rows [y0, y0+n_rows). Returns
    f32[n_rows, W, 3]. ``y0`` may be traced (e.g. a mesh axis offset),
    ``n_rows`` is static — this is the SPMD building block: each device
    renders its own row window of the film.
    """
    R = width * n_rows
    pix = jnp.arange(R)
    xs = pix % width
    ys = pix // width + y0
    # Jitter streams live far above any per-segment stream id.
    jx = stream_uniform(key, 1 << 30, (R,)) * 2.0 - 1.0
    jy = stream_uniform(key, (1 << 30) + 1, (R,)) * 2.0 - 1.0
    o, d = camera.generate_rays(xs, ys, jx, jy, width, height)

    rc = config.ray_chunk
    if rc <= 0 or rc >= R:
        radiance = trace_radiance(scene, o, d, key, config, accel)
    else:
        # Tile the wavefront so the [rays, triangles] intersection
        # intermediate stays bounded; tiles run sequentially under one jit.
        pad = (-R) % rc
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)], axis=0)
            d = jnp.concatenate(
                [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))],
                axis=0,
            )
        o = o.reshape(-1, rc, 3)
        d = d.reshape(-1, rc, 3)
        ids = jnp.arange(o.shape[0])

        def tile(args):
            o_c, d_c, i = args
            return trace_radiance(
                scene, o_c, d_c, jax.random.fold_in(key, (1 << 29) + i), config, accel
            )

        radiance = jax.lax.map(tile, (o, d, ids)).reshape(-1, 3)[:R]
    return radiance.reshape(n_rows, width, 3)


def render_sample_batch(
    scene: ScenePack,
    camera: Camera,
    key: jax.Array,
    width: int,
    height: int,
    config: TraceConfig,
    accel=None,
) -> jnp.ndarray:
    """One sample per pixel over the full frame. Returns f32[H, W, 3].

    Equivalent to one iteration of the reference's per-kernel sample
    loop (CUTracer.cu:193-213): jittered pixel position, pinhole ray,
    one radiance estimate.
    """
    return render_rows(
        scene, camera, key, width, height, 0, height, config, accel
    )


# Jitted entry points (config and frame geometry are static): one XLA
# compilation per configuration instead of eager op-by-op dispatch.
trace_radiance_jit = jax.jit(trace_radiance, static_argnames=("config",))
render_sample_batch_jit = jax.jit(
    render_sample_batch, static_argnames=("width", "height", "config")
)
