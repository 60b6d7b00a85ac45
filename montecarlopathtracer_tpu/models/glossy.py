"""Procedural glossy-steps scene family — the reference's scene02
(SURVEY.md C9): an open stage of two planes lit by four sphere emitters
of different radii, with four glossy cubes of decreasing Phong exponent
(Ns = 50/20/10/5, `scene02.mtl:26-45`) showing the roughness ladder.
Layout is procedural (same family, parameterized), not a byte copy;
`models.cornell.load_reference_scene(2, ...)` loads the original asset
for exact parity runs.
"""

from __future__ import annotations

from typing import Tuple

from ..scene.objio import ObjModel
from ..scene.scene import ScenePack, scene_pack_from_model
from ..scene.camera import Camera, camera_for_scene
from .cornell import _Builder


def glossy_steps_model(
    *,
    emitter_ka: float = 1.0,
    ns_ladder: Tuple[float, ...] = (50.0, 20.0, 10.0, 5.0),
    sphere_subdiv: int = 2,
) -> ObjModel:
    """Two planes + four sphere emitters + four glossy cubes."""
    b = _Builder()
    gray = b.add_material("floor", Kd=(0.75, 0.75, 0.75))
    wall = b.add_material("wall", Kd=(0.7, 0.7, 0.75))
    light = b.add_material("light", Ka=(emitter_ka,) * 3)

    # Stage: floor plane and back wall (scene02 has two planes,
    # scene02.obj:18-27).
    b.add_quad(
        "floor", gray,
        (-10, 0, -8), (-10, 0, 10), (10, 0, 10), (10, 0, -8), (0, 1, 0),
    )
    b.add_quad(
        "back", wall,
        (-10, 0, -8), (10, 0, -8), (10, 14, -8), (-10, 14, -8), (0, 0, 1),
    )

    # Four glossy cubes in a row, Ns descending (the "steps").
    xs = (-6.0, -2.0, 2.0, 6.0)
    for i, (x, ns) in enumerate(zip(xs, ns_ladder)):
        mat = b.add_material(
            f"glossy{i}", Kd=(0.2, 0.2, 0.2), Ks=(0.8, 0.8, 0.8), Ns=ns
        )
        s = 1.4  # half-size
        y0, y1 = 0.0, 2.0 * s
        g = f"cube{i}"
        # 6 faces of an axis-aligned cube centered at (x, s, 0)
        b.add_quad(g, mat, (x - s, y0, -s), (x - s, y0, s), (x + s, y0, s), (x + s, y0, -s), (0, -1, 0))
        b.add_quad(g, mat, (x - s, y1, -s), (x + s, y1, -s), (x + s, y1, s), (x - s, y1, s), (0, 1, 0))
        b.add_quad(g, mat, (x - s, y0, s), (x - s, y1, s), (x + s, y1, s), (x + s, y0, s), (0, 0, 1))
        b.add_quad(g, mat, (x - s, y0, -s), (x + s, y0, -s), (x + s, y1, -s), (x - s, y1, -s), (0, 0, -1))
        b.add_quad(g, mat, (x - s, y0, -s), (x - s, y1, -s), (x - s, y1, s), (x - s, y0, s), (-1, 0, 0))
        b.add_quad(g, mat, (x + s, y0, -s), (x + s, y0, s), (x + s, y1, s), (x + s, y1, -s), (1, 0, 0))

    # Four sphere emitters of different radii (scene02: 4 Ka=1 spheres).
    for i, (x, r) in enumerate(zip(xs, (0.6, 0.9, 1.2, 1.5))):
        b.add_sphere(f"lamp{i}", light, (x, 6.5, 1.0), r, sphere_subdiv)
    return b.model


def glossy_steps(
    *,
    emitter_ka: float = 1.0,
    sphere_subdiv: int = 2,
    width: int = 256,
    height: int = 256,
) -> Tuple[ScenePack, Camera]:
    """Procedural glossy-steps scene + the scene-2 camera
    (eye (0,5,23) looking −z, CUTracer.cu:361-374)."""
    model = glossy_steps_model(
        emitter_ka=emitter_ka, sphere_subdiv=sphere_subdiv
    )
    pack = scene_pack_from_model(model)
    cam = camera_for_scene(2, width, height)
    return pack, cam
