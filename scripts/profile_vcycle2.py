"""In-jit component timing of the headline geometric V-cycle (round 4).

All timings loop inside one jit (scan with a scalar carry scaling the
input so nothing hoists or DCEs) — per-dispatch tunnel round trips never
enter the numbers.  Attributes the 2.05 ms/cycle of BENCH_r03 (VERDICT r3
'next' #3).
"""

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
            leaves = jax.tree.leaves(y)
            s = sum(jnp.mean(l) for l in leaves)
            return c * (1.0 + 1e-30 * s), None
        fn = jax.jit(lambda s: jax.lax.scan(body, s, None, length=n)[0])
        fn(jnp.float32(1.0)).block_until_ready()
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
    print("phase impls:", [type(p).__name__ for p in solver._phase],
          file=sys.stderr)

    T = solver.initial_condition()
    b = solver._rhs(T)
    x_t, b_t = _fused.to_t(T), _fused.to_t(b)
    op0, op1 = solver._stencil
    ph0, ph1 = solver._phase
    coefs0 = solver._phase_coefs(0, cfg.n_smooth)
    coefs1 = solver._phase_coefs(1, cfg.coarse_sweeps)
    bp0 = op0._bp(b_t, True)

    ms = lambda s: f"{s * 1e3:7.3f} ms"
    print("full cycle          ",
          ms(timed(lambda x: solver._vcycle_t(0, x, b_t), x_t)))
    print(f"fine phase ({len(coefs0)+2} rds)  ",
          ms(timed(lambda x: ph0.phase(x, bp0, coefs0)[0], x_t)))
    r_t = op0.apply(x_t, True)
    bc = msemi.restrict_t(r_t, 1)
    bp1 = op1._bp(bc, False)
    print(f"coarse phase ({len(coefs1)+2} rds)",
          ms(timed(lambda x: ph1.phase(x, bp1, coefs1)[0], bc)))
    print("restrict_t          ",
          ms(timed(lambda r: msemi.restrict_t(r, 1), r_t)))
    print("prolong_t           ",
          ms(timed(lambda e: msemi.prolong_t(e, 1), bc)))
    print("mul_self            ", ms(timed(ph0.mul_self, x_t)))
    print("bp (solve_diag)     ",
          ms(timed(lambda bb: op0._bp(bb, True), b_t)))
    print("stencil apply (ref) ",
          ms(timed(lambda x: op0.apply(x, True), x_t)))

    # the OTHER kernel implementation at the fine level, same phase
    other_impl = ("resident"
                  if type(ph0).__name__ == "PhaseOperator" else "stream")
    try:
        ph0b = _ps.make_phase(op0, impl=other_impl)
        print(f"fine phase [{other_impl}]",
              ms(timed(lambda x: ph0b.phase(x, bp0, coefs0)[0], x_t)))
    except ValueError as e:
        print(f"fine phase [{other_impl}]: infeasible ({e})")

    # launch-overhead floor: a trivial kernel chain of the same length as
    # the cycle's launch count
    tiny = jnp.ones((8, 128), jnp.float32)
    def chain(n):
        def f(x):
            for _ in range(n):
                x = x * 1.0000001
            return x
        return f
    t1 = timed(chain(1), tiny)
    t40 = timed(chain(40), tiny)
    print(f"tiny-op chain: 1 -> {t1*1e6:.0f} us, 40 -> {t40*1e6:.0f} us")


if __name__ == "__main__":
    main()
