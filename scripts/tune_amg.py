"""Sweep production-amg knobs on untitled8192: ms/cycle x rho -> ms_to_1e6.

The round-3 verdict's bar: amg ms_to_1e6 <= 60 (was 183.8 in r3; the
round-4 kernel work brought the cycle 16.55 -> ~9 ms, this finds the best
(cheb_degree, agg_sweeps, agg_cycles, strength) trade).
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from p_a_multigrids_tpu.config import SemiConfig
    from p_a_multigrids_tpu.mesh import topology
    from p_a_multigrids_tpu.models import semi as msemi

    def timed(step, x0, n=30, reps=3):
        fn = jax.jit(lambda x: jax.lax.scan(
            lambda c, _: (step(c), None), x, None, length=n)[0])
        jax.block_until_ready(fn(x0))
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(fn(x0))
            best = min(best, time.time() - t0)
        return best / n

    def rho_linear(solver, n=8):
        T = solver.initial_condition()
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=T.shape).astype(np.float32))
        zero = jnp.zeros_like(T)

        @jax.jit
        def seq(x):
            def cyc(x, _):
                x = solver._vcycle(0, x, zero, hom=True)
                nrm = jnp.linalg.norm(x)
                return x / jnp.maximum(nrm, 1e-30), nrm
            return jax.lax.scan(cyc, x / jnp.linalg.norm(x), None,
                                length=n)[1]
        f = np.asarray(seq(x0), np.float64)
        return float(np.exp(np.mean(np.log(np.maximum(f[2:], 1e-30)))))

    mesh = topology.rcm_reorder(
        topology.from_msh("/root/reference/Mesh_files/untitled8192.msh"))

    def pcg_ms(s):
        """Production implicit metric: V-cycle-preconditioned PCG wall
        time + iterations for a 1e6 relative residual drop."""
        from p_a_multigrids_tpu.ops import fused as _f
        from p_a_multigrids_tpu.ops import krylov as _k
        op = s._stencil[0]
        b_t = s._rhs_t(_f.to_t(s.initial_condition()))
        b_lin = b_t - op.apply(jnp.zeros_like(b_t), True)
        fn = jax.jit(lambda bb: _k.pcg(
            lambda x: op.apply(x, False), bb, jnp.zeros_like(bb),
            precond=lambda r: s._vcycle_t(0, jnp.zeros_like(r), r,
                                          hom=True),
            tol=1e-6, maxiter=40)[1])
        its = int(fn(b_lin))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn(b_lin).block_until_ready()
            best = min(best, time.time() - t0)
        return its, best * 1e3

    # round-5 sweep: the r4 attribution (docs/PROFILE_r4, profile_amg r5
    # rerun) puts ~40% of the 8.9 ms cycle in the two deg-16 fine phases
    # and ~55% in the agg correction (5 level-0 applies at ~0.65 ms + ~8
    # small-level calls at ~0.3 ms) -- so the knobs that matter are the
    # phase degree, the per-level sweep count, and the level-0 size
    cases = [
        ("deg16-sw2 (r4 prod)", dict(cheb_degree=16, cheb_lower=0.05,
                                     agg_strength=0.5)),
        ("deg16-sw1", dict(cheb_degree=16, cheb_lower=0.05,
                           agg_strength=0.5, agg_sweeps=1)),
        ("deg12-sw1", dict(cheb_degree=12, cheb_lower=0.05,
                           agg_strength=0.5, agg_sweeps=1)),
        ("deg10-sw1", dict(cheb_degree=10, cheb_lower=0.06,
                           agg_strength=0.5, agg_sweeps=1)),
        ("deg12-sw2", dict(cheb_degree=12, cheb_lower=0.05,
                           agg_strength=0.5)),
        ("deg16-sw1-t8", dict(cheb_degree=16, cheb_lower=0.05,
                              agg_strength=0.5, agg_sweeps=1,
                              agg_target=8)),
        ("deg12-sw1-t8", dict(cheb_degree=12, cheb_lower=0.05,
                              agg_strength=0.5, agg_sweeps=1,
                              agg_target=8)),
    ]
    for name, kw in cases:
        try:
            cfg = SemiConfig(dt=0.05, ntime=1, n_multigrid=1,
                             dtype="float32", n_split=2, multi_levels=1,
                             amg=True, **kw)
            t0 = time.time()
            s = msemi.SemiSolver(msemi.build_problem(mesh, cfg))
            setup = time.time() - t0
            T = s.initial_condition()
            b = s._rhs(T)
            per = timed(lambda x: s._vcycle(0, x, b), T)
            rho = rho_linear(s)
            t6 = (per * math.log(1e6) / -math.log(rho) * 1e3
                  if 0 < rho < 1 else float("inf"))
            its, pms = pcg_ms(s)
            print(f"{name:20s} {per*1e3:7.3f} ms/cyc rho={rho:.4f} "
                  f"ms_to_1e6={t6:7.2f} pcg={its}it/{pms:6.1f}ms "
                  f"(setup {setup:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:20s} FAILED: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
