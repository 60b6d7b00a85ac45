"""BSDF importance samplers, vectorized over the ray wavefront (SoA).

Same sampling *math* as the reference's per-thread samplers
(`CVMCTracer/CVMCTracer/CUDA/Utils.hpp:46-137`, mirrored in
`MCRT/QuinEngine/Shader/rtx.hlsl:213-302`), re-expressed as pure
branch-free array functions: every conditional becomes `jnp.where`
masking so all lanes execute one fused VPU program; every `sqrt`/`div`
is guarded so inactive lanes can't produce NaNs (NaNs in unselected
`where` branches would poison reverse-mode gradients).

Layout: vectors are **component-major** ``f32[3, R]`` ("SoA"). On TPU
the last axis maps to the 128-wide vector lanes; an ``[R, 3]`` layout
would waste 125/128 lanes on every elementwise op, which measured as
the dominant cost of the whole integrator. With ``[3, R]`` the R axis
fills the lanes and the component axis sits on sublanes.

All functions take explicit uniforms (drawn by the caller from the
counter-based streams in `ops.rng`) — they are deterministic and
replayable, which is what makes path-replay gradients work.

Conventions (identical to the reference):
- local frames are built about +Y; a sampled local direction
  ``(sinT cosφ, cosT, sinT sinφ)`` is rotated so +Y maps to the normal,
  with exact special cases for normal = ±Y (Utils.hpp:55-68);
- `sample_phong` samples the *half-vector* from the cos^Ns lobe and
  mirrors the incident direction about it (Utils.hpp:72-95) — the
  result may point below the surface, as in the reference;
- `sample_fresnel` uses the Schlick-style refract probability
  ``Tr * (1 - (1-|n·i|)^5)`` with Snell refraction and total internal
  reflection on exit (Utils.hpp:97-137).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1.19209290e-7  # FLT_EPSILON, matching the reference's guards


def dot3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product of [3, R] vectors → [R]."""
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def normalize3(v: jnp.ndarray) -> jnp.ndarray:
    """Safe-normalize [3, R] vectors."""
    n = jnp.sqrt(jnp.maximum(dot3(v, v), _EPS * _EPS))
    return v / n[None, :]


def _rotate_to_frame(local: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Rotate +Y-frame directions [3, R] into the frame of ``normal``.

    Vectorized equivalent of the reference's three-way branch
    (Utils.hpp:54-68): normal ≈ -Y → negate; normal ≈ +Y → identity;
    otherwise the closed-form rotation using invlen = 1/sqrt(1-ny²).
    """
    nx, ny, nz = normal[0], normal[1], normal[2]
    dx, dy, dz = local[0], local[1], local[2]

    s2 = jnp.maximum(1.0 - ny * ny, _EPS * _EPS)  # guarded for ny ≈ ±1
    inv_len = 1.0 / jnp.sqrt(s2)
    length = jnp.sqrt(s2)

    rx = (nz * dx + nx * ny * dz) * inv_len + nx * dy
    ry = ny * dy - dz * length
    rz = (-nx * dx + nz * ny * dz) * inv_len + nz * dy
    rotated = jnp.stack([rx, ry, rz], axis=0)

    near_neg_y = (jnp.abs(ny + 1.0) < _EPS)[None, :]
    near_pos_y = (jnp.abs(ny - 1.0) < _EPS)[None, :]
    out = jnp.where(near_pos_y, local, rotated)
    out = jnp.where(near_neg_y, -local, out)
    return out


def sample_hemi(u1: jnp.ndarray, u2: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere sample about ``normal`` [3, R]
    (Utils.hpp:46-70): sinθ = √u1, cosθ = √(1-u1), φ = 2πu2."""
    sin_t = jnp.sqrt(u1)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    phi = 2.0 * jnp.pi * u2
    local = jnp.stack([sin_t * jnp.cos(phi), cos_t, sin_t * jnp.sin(phi)], axis=0)
    return _rotate_to_frame(local, normal)


def sample_phong(
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    normal: jnp.ndarray,
    indir: jnp.ndarray,
    ns: jnp.ndarray,
) -> jnp.ndarray:
    """Phong-lobe sample (Utils.hpp:72-95): draw a half-vector from the
    cos^Ns lobe about ``normal`` (cosθ = u1^{1/(Ns+1)}) and mirror the
    incident direction about it. All vectors [3, R]."""
    cos_t = jnp.power(jnp.maximum(u1, 1e-30), 1.0 / (ns + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u2
    local = jnp.stack([sin_t * jnp.cos(phi), cos_t, sin_t * jnp.sin(phi)], axis=0)
    half = _rotate_to_frame(local, normal)
    return indir - half * (2.0 * dot3(indir, half))[None, :]


def sample_phong_reflect(
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    normal: jnp.ndarray,
    indir: jnp.ndarray,
    ns: jnp.ndarray,
) -> jnp.ndarray:
    """Classic-Phong specular sample: draw the OUTGOING direction from
    the cos^Ns lobe about the mirror reflection of ``indir``.

    The reference's committed sampler is the half-vector (Blinn-Phong)
    formulation (`Utils.hpp:72-95` = `sample_phong` above), but
    MC.docx's result figures compare a "Blinn-Phong model" against a
    "Phong model" (Figures 3/4 = the committed result3/result4
    renders), so the classic variant is a reference capability too.
    Selected with ``TraceConfig.phong_model="phong"``.
    """
    cos_t = jnp.power(jnp.maximum(u1, 1e-30), 1.0 / (ns + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u2
    local = jnp.stack(
        [sin_t * jnp.cos(phi), cos_t, sin_t * jnp.sin(phi)], axis=0
    )
    return _rotate_to_frame(local, _reflect(indir, normal))


def _reflect(indir: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    return indir - normal * (2.0 * dot3(indir, normal))[None, :]


def sample_fresnel(
    u: jnp.ndarray,
    normal: jnp.ndarray,
    indir: jnp.ndarray,
    tr: jnp.ndarray,
    ni: jnp.ndarray,
) -> jnp.ndarray:
    """Schlick/Snell refract-or-reflect sample (Utils.hpp:97-137).

    refract w.p. ``Tr (1 - (1-|n·i|)^5)``; entering (n·i ≤ 0) uses
    1/Ni, exiting uses Ni with total-internal-reflection fallback;
    otherwise mirror reflection. All vectors [3, R]; u/tr/ni [R].
    """
    ndoti = dot3(indir, normal)
    tr_eff = tr * (1.0 - jnp.power(1.0 - jnp.abs(ndoti), 5.0))
    refract = u < tr_eff
    entering = ndoti <= 0.0

    def _sqrt_nonneg(x):
        # sqrt(max(x, 0)) with a NaN-free backward: d(sqrt) at 0 is ∞,
        # and reverse-mode multiplies it by the (zero) cotangent of the
        # where-unselected branch — 0·∞ = NaN (r4: this poisoned vertex
        # gradients through the megakernel whenever any lane sat
        # exactly at the TIR/grazing boundary). Same forward values.
        pos = x > 0.0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)

    # Entering: alpha = -n·i/Ni - sqrt(1 - (1 - (n·i)^2)/Ni^2)
    in_rad = 1.0 - (1.0 - ndoti * ndoti) / (ni * ni)
    in_alpha = -ndoti / ni - _sqrt_nonneg(in_rad)
    d_in = normalize3(normal * in_alpha[None, :] + indir / ni[None, :])

    # Exiting: test = 1 - (1 - (n·i)^2) Ni^2 ; TIR when test < 0
    test = 1.0 - (1.0 - ndoti * ndoti) * ni * ni
    out_alpha = -ndoti * ni + _sqrt_nonneg(test)
    d_out = normalize3(normal * out_alpha[None, :] + indir * ni[None, :])

    d_reflect = _reflect(indir, normal)

    d_refract = jnp.where(
        entering[None, :],
        d_in,
        jnp.where((test < 0.0)[None, :], d_reflect, d_out),
    )
    return jnp.where(refract[None, :], d_refract, d_reflect)
