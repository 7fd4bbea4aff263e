"""Multi-device scaling benchmark for the sharded bz transform.

BASELINE config 5 calls for >= 85% scaling efficiency on block-sharded
compression.  On a real pod slice this script runs as-is over the ICI
mesh; in this environment (one physical chip) it demonstrates the
measurement on the virtual CPU mesh:

    JAX_PLATFORMS='' python bench_scaling.py          # 8-way CPU mesh

Prints one JSON line: per-device-count wall time and efficiency vs the
single-device run (blocks are embarrassingly parallel; the only
collective is the all_gather of per-block symbol counts).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Virtual-mesh setup must happen BEFORE jax initializes a backend:
# probing jax.devices() first would pin the single real chip and the
# host-platform device count could no longer take effect.  Set
# TPULC_SCALING_REAL=1 on an actual pod slice to use the ICI mesh.
if not os.environ.get("TPULC_SCALING_REAL"):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )


def main():
    import jax

    if not os.environ.get("TPULC_SCALING_REAL"):
        jax.config.update("jax_platforms", "cpu")

    from tpulc.dist.mesh import make_mesh
    from tpulc.dist.sharded import sharded_bz_forward, sharded_bz_roundtrip

    n_dev = len(jax.devices())
    block_size = 1 << 16
    n_blocks = 2 * n_dev  # fixed problem per device count sweep below

    results = {}
    results_rt = {}
    for k in sorted({1, 2, n_dev} | {n_dev}):
        if k > n_dev:
            continue
        mesh = make_mesh(k)
        step, make_args = sharded_bz_forward(mesh, block_size)
        step_rt, make_args_rt = sharded_bz_roundtrip(mesh, block_size)
        # strong scaling: same total work for every k
        total_blocks = n_dev * 2
        if total_blocks % k:
            total_blocks = k * (total_blocks // k + 1)
        args = make_args(total_blocks, rng_seed=1)
        out = step(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = step(*args)
        jax.block_until_ready(out)
        results[k] = (time.perf_counter() - t0) / 3
        args_rt = make_args_rt(total_blocks, rng_seed=1)
        back, sizes = step_rt(*args_rt)
        jax.block_until_ready(back)
        assert np.array_equal(np.asarray(back), np.asarray(args_rt[0])), \
            "sharded roundtrip mismatch"
        t0 = time.perf_counter()
        for _ in range(3):
            out = step_rt(*args_rt)
        jax.block_until_ready(out)
        results_rt[k] = (time.perf_counter() - t0) / 3

    base = results[1] if 1 in results else next(iter(results.values()))
    eff = {
        k: round(base / (t * k), 3) for k, t in results.items()
    }
    base_rt = results_rt[1] if 1 in results_rt else next(iter(results_rt.values()))
    out = {
        "metric": "bz_sharded_scaling",
        "devices": {str(k): round(t, 4) for k, t in results.items()},
        "efficiency_vs_1dev": eff,
        "roundtrip_devices": {str(k): round(t, 4)
                              for k, t in results_rt.items()},
        "roundtrip_efficiency_vs_1dev": {
            k: round(base_rt / (t * k), 3) for k, t in results_rt.items()
        },
        "backend": jax.default_backend(),
    }
    if jax.default_backend() == "cpu":
        out["note"] = (
            "virtual CPU devices share the host's cores: this run "
            "validates the sharded program, not scaling; run on a pod "
            "slice for ICI efficiency numbers"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    import os

    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    main()
