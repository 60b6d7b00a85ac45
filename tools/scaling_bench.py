"""Scaling-efficiency harness (VERDICT r2 missing #4 / BASELINE north
star "≥90% linear scaling").

Measures the sharded SPMD render pass (`parallel/sharded.py`) across
mesh sizes and writes SCALING.json. Two regimes:

- On real multi-chip hardware (a pod slice) this measures true weak
  scaling: per-device work held constant, efficiency =
  t(1 device) / t(n devices); the BASELINE target is ≥90% at n=2 hosts.
- On the virtual CPU mesh (`--xla_force_host_platform_device_count=8`,
  the only thing available in this environment) all "devices" share the
  same host cores, so wall time necessarily grows with n — the curve
  here measures the SPMD program's *overhead* (collective + partition
  bookkeeping), reported as total-work throughput per mesh size. The
  harness is identical either way; only the interpretation changes
  (recorded in the JSON's ``regime`` field).

Weak scaling setup: each device owns a fixed 64-row × 512-wide film
band at 2 spp; the mesh grows along the ``rays`` axis, so the frame
height is 64·n. The film psum over the spp axis and the band-sharded
output exercise the collective path at every size.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python tools/scaling_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS_PER_DEVICE = 64
WIDTH = 512
SPP = 2


def main() -> int:
    import jax
    import numpy as np

    from montecarlopathtracer_tpu.models import cornell
    from montecarlopathtracer_tpu.parallel.mesh import make_mesh
    from montecarlopathtracer_tpu.parallel.sharded import sharded_sample_pass
    from montecarlopathtracer_tpu.render.integrator import (
        TraceConfig,
        render_rows,
    )

    n_dev = len(jax.devices())
    n_cores = os.cpu_count() or 1
    backend = jax.default_backend()
    regime = "weak-scaling" if backend == "tpu" else "virtual-mesh-overhead"
    print(f"backend={backend} devices={n_dev} cores={n_cores} "
          f"regime={regime}", file=sys.stderr)

    config = TraceConfig(mode="fixed", max_depth=5, ray_chunk=0)

    def timed(fn, *args, reps=3):
        out = fn(*args)
        float(np.asarray(out).ravel()[0])  # fetch fence (compile+warmup)
        t0 = time.perf_counter()
        for r in range(reps):
            out = fn(*args)
        float(np.asarray(out).ravel()[0])
        return (time.perf_counter() - t0) / reps

    # SPMD bookkeeping overhead, measured directly: the SAME single-
    # device workload with and without the shard_map program around it.
    scene1, cam1 = cornell.cornell_box(width=WIDTH, height=ROWS_PER_DEVICE)
    plain = jax.jit(
        lambda s, c, k: sum(
            render_rows(
                s, c, jax.random.fold_in(k, i), WIDTH, ROWS_PER_DEVICE,
                0, ROWS_PER_DEVICE, config,
            )
            for i in range(SPP)
        )
        / SPP
    )
    t_plain = timed(plain, scene1, cam1, jax.random.key(0))
    mesh1 = make_mesh(1, 1, devices=jax.devices()[:1])
    f1 = sharded_sample_pass(
        mesh1, width=WIDTH, height=ROWS_PER_DEVICE, spp=SPP, config=config
    )
    t_sharded1 = timed(f1, scene1, cam1, jax.random.key(0))
    overhead = {
        "unsharded_seconds": round(t_plain, 4),
        "sharded_1dev_seconds": round(t_sharded1, 4),
        "spmd_overhead_pct": round(100 * (t_sharded1 / t_plain - 1), 1),
    }
    print(json.dumps({"overhead": overhead}), flush=True)

    sizes = [n for n in (1, 2, 4, 8) if n <= n_dev]
    rows = []
    t1 = None
    for n in sizes:
        height = ROWS_PER_DEVICE * n
        scene, cam = cornell.cornell_box(width=WIDTH, height=height)
        mesh = make_mesh(n, 1, devices=jax.devices()[:n])
        f = sharded_sample_pass(
            mesh, width=WIDTH, height=height, spp=SPP, config=config
        )
        dt = timed(f, scene, cam, jax.random.key(0))
        samples = WIDTH * height * SPP
        if t1 is None:
            t1 = dt
        eff = t1 / dt  # weak scaling: same per-device work each size
        # On a shared-core virtual mesh, n devices' work can at best
        # overlap onto n_cores cores: the compute-bound floor for the
        # pass is t1 * n / min(n, n_cores). Efficiency vs that floor
        # isolates SPMD overhead from the hardware's core limit.
        t_floor = t1 * n / min(n, n_cores)
        row = {
            "devices": n,
            "height": height,
            "seconds_per_pass": round(dt, 4),
            "total_msamples_s": round(samples / dt / 1e6, 3),
            "weak_scaling_efficiency": round(eff, 3),
            "efficiency_vs_shared_core_floor": round(t_floor / dt, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "backend": backend,
        "regime": regime,
        "host_cores": n_cores,
        "note": (
            "weak_scaling_efficiency = t(1)/t(n) at constant per-device "
            "work; meaningful as scaling only on real multi-chip "
            "hardware. On the virtual CPU mesh all devices share "
            "host_cores cores, so the informative numbers are "
            "spmd_overhead_pct (sharded vs unsharded, same work, one "
            "device) and efficiency_vs_shared_core_floor "
            "(t1*n/min(n,cores) / t(n))"
        ),
        "spmd_overhead": overhead,
        "rows_per_device": ROWS_PER_DEVICE,
        "width": WIDTH,
        "spp": SPP,
        "results": rows,
    }
    with open(os.path.join(ROOT, "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote SCALING.json ({len(rows)} sizes)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
