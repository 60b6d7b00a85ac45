"""Procedural scene families: structure + a smoke render."""

import numpy as np
import jax
import jax.numpy as jnp

from montecarlopathtracer_tpu.models import cornell, glossy
from montecarlopathtracer_tpu.render.integrator import (
    TraceConfig,
    render_sample_batch_jit,
)


def test_glossy_steps_structure():
    scene, cam = glossy.glossy_steps(width=16, height=16)
    T = int(np.asarray(scene.tri_valid).sum())
    # 2 stage quads (4 tris) + 4 cubes (48 tris) + 4 icospheres
    # (320 tris each at subdiv 2)
    assert T == 4 + 48 + 4 * 320
    # emitters present: some material has Ka > 0
    assert float(jnp.max(scene.mat_ka)) > 0.0
    # the Ns ladder is monotone decreasing over the glossy materials
    ns = np.asarray(scene.mat_ns)
    glossy_ns = sorted(
        (x for x in ns if x > 1.0 and x < 1000.0), reverse=True
    )
    assert glossy_ns == [50.0, 20.0, 10.0, 5.0]


def test_glossy_steps_renders_light():
    scene, cam = glossy.glossy_steps(width=16, height=16)
    cfg = TraceConfig(mode="fixed", max_depth=3, illum=10.0, ray_chunk=0)
    img = render_sample_batch_jit(
        scene, cam, jax.random.key(0), width=16, height=16, config=cfg
    )
    arr = np.asarray(img)
    assert np.isfinite(arr).all()
    assert arr.max() > 0.0, "some light must reach the film"


def test_distributed_noop_single_process(monkeypatch):
    from montecarlopathtracer_tpu.parallel import distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    assert distributed.ensure_initialized() is False
    info = distributed.process_info()
    assert info["process_count"] == 1
    assert info["global_devices"] >= 1
