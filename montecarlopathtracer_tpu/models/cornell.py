"""Procedural Cornell-box scene family.

The reference ships three authored OBJ scenes (SURVEY.md C9): scene01 is
a Cornell box with white/red/blue walls, a ceiling lamp emitter, a
mirror sphere (Ks=1, Ns=1000) and a glass sphere (Tr=0.9, Ni=1.5);
scene02 is a glossy-steps scene with four sphere emitters. This module
*procedurally* builds the same scene family — same wall layout, same
material semantics, parameterized — so the framework's tests and
benchmarks are self-contained, while `load_reference_scene` loads the
original assets (read-only) when parity against the committed goldens is
wanted.

Geometry conventions match the reference scenes: the box interior is
roughly x ∈ [-6, 6], y ∈ [0, 10], z ∈ [-6, 6] with the camera on +z
looking down −z (CUTracer.cu:347-360).
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Tuple

import numpy as np

from ..scene.objio import ObjModel, ObjMaterial, ObjTriangle
from ..scene.scene import ScenePack, scene_pack_from_model
from ..scene.camera import Camera, camera_for_scene

REFERENCE_SCENES = "/root/reference/CVMCTracer/CVMCTracer/Resources"


class _Builder:
    """Assembles an ObjModel programmatically (vertices/normals are
    1-based with the dummy 0 slot, matching the parser contract)."""

    def __init__(self):
        self.model = ObjModel()

    def add_material(self, name: str, **kw) -> int:
        self.model.materials.append(ObjMaterial(name=name, **kw))
        return len(self.model.materials) - 1

    def _vert(self, p) -> int:
        self.model.vertices.append(tuple(float(x) for x in p))
        return len(self.model.vertices) - 1

    def _norm(self, n) -> int:
        self.model.normals.append(tuple(float(x) for x in n))
        return len(self.model.normals) - 1

    def add_quad(self, group: str, material: int, p0, p1, p2, p3, normal) -> None:
        """Two triangles (fan split like the reference parser,
        ObjReader.cpp:90-104) sharing one face normal."""
        vi = [self._vert(p) for p in (p0, p1, p2, p3)]
        ni = self._norm(normal)
        g = self.model.groups.setdefault(group, [])
        for tri in ((vi[0], vi[1], vi[2]), (vi[0], vi[2], vi[3])):
            self.model.triangles.append(
                ObjTriangle(v=tri, n=(ni, ni, ni), material=material)
            )
            g.append(len(self.model.triangles) - 1)

    def add_sphere(
        self, group: str, material: int, center, radius: float, subdiv: int = 2
    ) -> None:
        """Icosphere with smooth (per-vertex) normals."""
        t = (1.0 + math.sqrt(5.0)) / 2.0
        verts = [
            (-1, t, 0), (1, t, 0), (-1, -t, 0), (1, -t, 0),
            (0, -1, t), (0, 1, t), (0, -1, -t), (0, 1, -t),
            (t, 0, -1), (t, 0, 1), (-t, 0, -1), (-t, 0, 1),
        ]
        faces = [
            (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
            (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
            (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
            (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
        ]
        verts = [np.asarray(v, np.float64) for v in verts]
        verts = [v / np.linalg.norm(v) for v in verts]
        cache = {}

        def midpoint(i, j):
            k = (min(i, j), max(i, j))
            if k not in cache:
                m = verts[i] + verts[j]
                m /= np.linalg.norm(m)
                verts.append(m)
                cache[k] = len(verts) - 1
            return cache[k]

        for _ in range(subdiv):
            new_faces = []
            for a, b, c in faces:
                ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
                new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
            faces = new_faces

        center = np.asarray(center, np.float64)
        vid = [self._vert(center + radius * v) for v in verts]
        nid = [self._norm(v) for v in verts]
        g = self.model.groups.setdefault(group, [])
        for a, b, c in faces:
            self.model.triangles.append(
                ObjTriangle(
                    v=(vid[a], vid[b], vid[c]),
                    n=(nid[a], nid[b], nid[c]),
                    material=material,
                )
            )
            g.append(len(self.model.triangles) - 1)


def cornell_box_model(
    *,
    emitter_ka: float = 0.78,
    with_mirror_sphere: bool = False,
    with_glass_sphere: bool = False,
    sphere_subdiv: int = 2,
) -> ObjModel:
    """Cornell box in the reference scene01 layout: white floor/ceiling/
    back, red left wall, blue right wall, ceiling lamp cube; optional
    mirror (Ks=1, Ns=1000) and glass (Tr=0.9, Ni=1.5) spheres
    (scene01.mtl)."""
    b = _Builder()
    white = b.add_material("white", Kd=(0.8, 0.8, 0.8))
    red = b.add_material("red", Kd=(1.0, 0.0, 0.0))
    blue = b.add_material("blue", Kd=(0.0, 0.0, 1.0))
    light = b.add_material("light", Ka=(emitter_ka,) * 3, Kd=(0.8, 0.8, 0.8))

    x0, x1 = -6.0, 6.0
    y0, y1 = 0.0, 10.0
    z0, z1 = -6.0, 6.0
    # floor (+y up)
    b.add_quad("floor", white, (x0, y0, z0), (x0, y0, z1), (x1, y0, z1), (x1, y0, z0), (0, 1, 0))
    # ceiling
    b.add_quad("ceiling", white, (x0, y1, z0), (x1, y1, z0), (x1, y1, z1), (x0, y1, z1), (0, -1, 0))
    # back wall (z0, normal +z)
    b.add_quad("back", white, (x0, y0, z0), (x1, y0, z0), (x1, y1, z0), (x0, y1, z0), (0, 0, 1))
    # left wall (x0, normal +x)
    b.add_quad("left", red, (x0, y0, z0), (x0, y1, z0), (x0, y1, z1), (x0, y0, z1), (1, 0, 0))
    # right wall (x1, normal -x)
    b.add_quad("right", blue, (x1, y0, z0), (x1, y0, z1), (x1, y1, z1), (x1, y1, z0), (-1, 0, 0))
    # ceiling lamp: small downward-facing quad just below the ceiling
    lx0, lx1, lz0, lz1, ly = -1.5, 1.5, -1.5, 1.5, y1 - 0.01
    b.add_quad("lamp", light, (lx0, ly, lz0), (lx1, ly, lz0), (lx1, ly, lz1), (lx0, ly, lz1), (0, -1, 0))

    if with_mirror_sphere:
        mirror = b.add_material("mirror", Ks=(1.0, 1.0, 1.0), Ns=1000.0)
        b.add_sphere("sphere_mirror", mirror, (-2.5, 2.0, -2.0), 2.0, sphere_subdiv)
    if with_glass_sphere:
        glass = b.add_material("glass", Kd=(0.5, 0.5, 0.5), Tr=0.9, Ni=1.5)
        b.add_sphere("sphere_glass", glass, (2.5, 2.0, 1.0), 2.0, sphere_subdiv)
    return b.model


def cornell_box(
    *,
    emitter_ka: float = 0.78,
    with_mirror_sphere: bool = False,
    with_glass_sphere: bool = False,
    sphere_subdiv: int = 2,
    width: int = 256,
    height: int = 256,
) -> Tuple[ScenePack, Camera]:
    """Procedural Cornell box + the scene-1 camera (eye (0,5,17) looking
    −z, 60° FOV — CUTracer.cu:347-360)."""
    model = cornell_box_model(
        emitter_ka=emitter_ka,
        with_mirror_sphere=with_mirror_sphere,
        with_glass_sphere=with_glass_sphere,
        sphere_subdiv=sphere_subdiv,
    )
    pack = scene_pack_from_model(model)
    cam = camera_for_scene(1, width, height)
    return pack, cam


def reference_scene_path(n: int) -> str:
    return os.path.join(REFERENCE_SCENES, f"scene{n:02d}.obj")


def has_reference_scenes() -> bool:
    return os.path.exists(reference_scene_path(1))


def load_reference_scene(
    n: int, *, width: int = 800, height: int = 600
) -> Tuple[ScenePack, Camera]:
    """Load one of the reference's committed scenes (read-only mount)
    with its hardcoded camera.

    Scene 2 gets the eye-(0,5,23) camera (CUTracer.cu:361-374); scene 3
    is not wired into the reference's `main.cpp` at all (only RENDER_1/2
    exist, main.cpp:6-7) and its box is closed on all six sides, so
    `camera_for_scene(3, ...)` places the camera inside the box.
    """
    from ..scene.scene import load_obj_scene

    pack = load_obj_scene(reference_scene_path(n))
    cam = camera_for_scene(n, width, height)
    return pack, cam


MCRT_SCENE = "/root/reference/MCRT/QuinEngine/Res/scene01.obj"


def has_mcrt_scene() -> bool:
    return os.path.exists(MCRT_SCENE)


def load_mcrt_scene(
    *, width: int = 640, height: int = 480
) -> Tuple[ScenePack, Camera]:
    """Load the MCRT backend's scene variant + camera.

    Same Cornell geometry as CVMCTracer scene01 but with MCRT's own
    `Res/scene01.mtl` (light is Ka=0.80 with *no* Kd; mirror/glass have
    no Kd either — diff vs the CVMCTracer mtl). MCRT parses it with
    tinyobjloader and uses **per-triangle** materials
    (ShaderResource.hpp:87-126), so ``material_mode="triangle"``.

    Parser-quirk note: our OBJ reader applies the CVMCTracer
    ``Ks ⇒ Ns=2`` quirk (ObjReader.cpp:225-233) which tinyobj doesn't
    have; for this asset it is a no-op because the only Ks material
    (sphere_mirror) sets Ns=1000 explicitly afterwards (verified by
    `tests/test_models.py::test_mcrt_scene_variant`).

    The matching render config is ``TraceConfig(mode="rr", illum=1.0)``
    with the π/4 camera and gamma-space accumulation
    (GraphicsRTX.cpp:173-197, rtx.hlsl:400-404).
    """
    from ..scene.scene import load_obj_scene
    from ..scene.camera import camera_for_mcrt

    pack = load_obj_scene(MCRT_SCENE, material_mode="triangle")
    return pack, camera_for_mcrt(width, height)
