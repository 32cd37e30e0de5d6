"""Benchmark: time per V-cycle + operator nnz/s on untitled8192 (flagship).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline context (BASELINE.md): the reference's multigrid level sweep ran
98,304 elements / 294,912 DOF for ntime=2, n_multigrid=2 (=> ~4 V-cycle
equivalents) in 26.25 s at its best level count — ~6.5 s per V-cycle on a
serial -O0 x86 build.  We run untitled8192.msh (8192 macro triangles) with
n_split=2 => 131,072 fine elements / 393,216 DOF — the same size class
(1.33x more DOF) — and report time per V-cycle; vs_baseline is the
reference's per-V-cycle time scaled by DOF ratio divided by ours.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from p_a_multigrids_tpu.config import SemiConfig
    from p_a_multigrids_tpu.mesh import topology
    from p_a_multigrids_tpu.models import semi as msemi

    mesh = topology.from_msh("/root/reference/Mesh_files/untitled8192.msh")
    cfg = SemiConfig(n_split=2, multi_levels=2, dt=0.05, ntime=1,
                     n_multigrid=1, dtype="float32")
    t0 = time.time()
    problem = msemi.build_problem(mesh, cfg)
    solver = msemi.SemiSolver(problem)
    setup_s = time.time() - t0

    T = solver.initial_condition()
    b = solver._rhs(T)
    vcycle = jax.jit(lambda x: solver._vcycle(0, x, b))

    # compile + warmup
    x = vcycle(T)
    x.block_until_ready()

    n_iter = 20
    t0 = time.time()
    for _ in range(n_iter):
        x = vcycle(x)
    x.block_until_ready()
    per_vcycle = (time.time() - t0) / n_iter

    U, C, nloc = np.asarray(T).shape
    ndof = U * C * nloc
    # effective block-nnz per fine-level operator application: each element
    # row couples to itself + 3 neighbors with nloc x nloc blocks
    nnz = U * C * 4 * nloc * nloc
    # V(4,4) with 2 levels: ~8 fine applications + residual + coarse work
    apps = 2 * cfg.n_smooth + 1
    nnz_per_s = nnz * apps / per_vcycle

    ref_per_vcycle = 6.5 * (ndof / 294912.0)   # DOF-scaled reference time
    result = {
        "metric": "time_per_vcycle_untitled8192_nsplit2",
        "value": round(per_vcycle * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(ref_per_vcycle / per_vcycle, 2),
        "extra": {
            "ndof": ndof,
            "setup_s": round(setup_s, 2),
            "nnz_per_s": round(nnz_per_s / 1e9, 3),
            "nnz_per_s_unit": "Gnnz/s",
            "residual": float(abs(np.asarray(
                solver.residual(0, x, b, True))).max()),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
