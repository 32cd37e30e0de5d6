"""Time the RESIDENT phase kernel at the headline C=16 config (round 4)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from p_a_multigrids_tpu.config import SemiConfig
    from p_a_multigrids_tpu.mesh import topology
    from p_a_multigrids_tpu.models import semi as msemi
    from p_a_multigrids_tpu.ops import fused as _fused
    from p_a_multigrids_tpu.ops import pallas_stencil as _ps

    def timed(f, x0, n=50, reps=3):
        def body(c, _):
            y = f(x0 * c)
            s = sum(jnp.mean(l) for l in jax.tree.leaves(y))
            return c * (1.0 + 1e-30 * s), None
        fn = jax.jit(lambda s: jax.lax.scan(body, s, None, length=n)[0])
        t0 = time.time()
        fn(jnp.float32(1.0)).block_until_ready()
        print(f"  (compile {time.time()-t0:.1f}s)", file=sys.stderr,
              flush=True)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn(jnp.float32(1.0)).block_until_ready()
            best = min(best, time.time() - t0)
        return best / n

    mesh = topology.rcm_reorder(
        topology.from_msh("/root/reference/Mesh_files/untitled8192.msh"))
    cfg = SemiConfig(dt=0.05, ntime=1, n_multigrid=1, dtype="float32",
                     n_split=2, multi_levels=2, coarse_agg=False)
    solver = msemi.SemiSolver(msemi.build_problem(mesh, cfg))
    op0, op1 = solver._stencil
    T = solver.initial_condition()
    b = solver._rhs(T)
    x_t, b_t = _fused.to_t(T), _fused.to_t(b)
    bp0 = op0._bp(b_t, True)
    coefs0 = solver._phase_coefs(0, cfg.n_smooth)

    ph = _ps.PhaseOperatorResident(op0)
    print(f"resident: TU={ph.TU} T={ph.T} W={ph.W} Cp={ph.Cp} "
          f"vmem~{ph._vmem_resident(ph.TU)>>20}MB", flush=True)
    ms = timed(lambda x: ph.phase(x, bp0, coefs0)[0], x_t)
    print(f"resident fine phase ({len(coefs0)+2} rds): {ms*1e3:.3f} ms",
          flush=True)

    coefs1 = solver._phase_coefs(1, cfg.coarse_sweeps)
    r_t = op0.apply(x_t, True)
    bc = msemi.restrict_t(r_t, 1)
    bp1 = op1._bp(bc, False)
    ph1 = _ps.PhaseOperatorResident(op1)
    print(f"resident coarse: TU={ph1.TU} T={ph1.T}", flush=True)
    ms1 = timed(lambda x: ph1.phase(x, bp1, coefs1)[0], bc)
    print(f"resident coarse phase ({len(coefs1)+2} rds): {ms1*1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
