"""Attribute the amg-mode cycle cost: phase vs agg correction pieces.

Run on the real TPU:  python scripts/profile_amg.py
Prints per-piece ms so the 16.55 ms/cycle of BENCH_r03 can be attributed
(VERDICT r3 'next' #2).
"""

import os
import sys
import time

# NOTE: sys.path insertion is safe here; a PYTHONPATH env var pointing at
# the repo breaks the axon TPU plugin registration in this environment
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import numpy as np


def timed(step, x0, n=30, reps=3):
    import jax
    fn = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (step(c), None), x, None, length=n)[0])
    r = fn(x0)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(x0))
        best = min(best, time.time() - t0)
    return best / n


def main():
    import jax
    import jax.numpy as jnp

    from p_a_multigrids_tpu.config import SemiConfig
    from p_a_multigrids_tpu.mesh import topology
    from p_a_multigrids_tpu.models import semi as msemi
    from p_a_multigrids_tpu.ops import agg as _agg

    t0 = time.time()
    mesh = topology.rcm_reorder(
        topology.from_msh("/root/reference/Mesh_files/untitled8192.msh"))
    cfg = SemiConfig(dt=0.05, ntime=1, n_multigrid=1, dtype="float32",
                     n_split=2, multi_levels=1, amg=True, agg_strength=0.5,
                     cheb_degree=16, cheb_lower=0.05)
    problem = msemi.build_problem(mesh, cfg)
    solver = msemi.SemiSolver(problem)
    print(f"setup {time.time()-t0:.1f}s", file=sys.stderr)
    h = solver._agg
    for i, lvl in enumerate(h.levels):
        print(f"agg level {i}: n={lvl.n} deg={lvl.cols.shape[1]} "
              f"p_deg={lvl.p_vals.shape[1]} r_deg={lvl.r_vals.shape[1]} "
              f"pallas op={lvl.op is not None} r={lvl.rstr is not None} "
              f"p={lvl.prol is not None}", file=sys.stderr)

    T = solver.initial_condition()
    from p_a_multigrids_tpu.ops import fused
    b_t = solver._rhs_t(fused.to_t(T))
    x_t = fused.to_t(T)

    # full cycle
    ms = timed(lambda x: solver._vcycle_t(0, x, b_t), x_t) * 1e3
    print(f"full amg cycle: {ms:.3f} ms")

    # phase only (2 phases as in the cycle)
    op = solver._stencil[0]
    ph = solver._phase[0]
    coefs = solver._phase_coefs(0, cfg.n_smooth)
    bp = op._bp(b_t, True)
    ms_ph = timed(lambda x: ph.phase(x, bp, coefs)[0], x_t) * 1e3
    print(f"one phase ({len(coefs)} rounds): {ms_ph:.3f} ms")

    # agg correction total
    r_t = b_t
    ms_corr = timed(lambda x: solver._agg_correct_t(0, x, r_t), x_t) * 1e3
    print(f"agg correct: {ms_corr:.3f} ms")

    # pieces of correct(): non-endomorphic ops timed with a scalar carry
    # scaling the input so the loop body cannot be hoisted
    def timed_op(f, x0, n=30, reps=3):
        def body(c, _):
            y = f(x0 * c)
            # carry depends on ALL of y so nothing is dead-code-eliminated
            return c * (1.0 + 1e-30 * jnp.mean(y)), None
        fn = jax.jit(lambda s: jax.lax.scan(body, s, None, length=n)[0])
        fn(jnp.float32(1.0)).block_until_ready()
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn(jnp.float32(1.0)).block_until_ready()
            best = min(best, time.time() - t0)
        return best / n

    U, C = op.U, op.C
    r_flat_t = jnp.swapaxes(r_t, 1, 2).reshape(3, U * C)
    lvl0 = h.levels[0]
    print(f"  restrict fine->agg0: "
          f"{timed_op(lambda v: _agg._restrict(lvl0, v), r_flat_t)*1e3:.3f}"
          f" ms")
    rc = _agg._restrict(lvl0, r_flat_t)
    print(f"  agg vcycle: "
          f"{timed_op(lambda v: _agg.vcycle(h, 0, v), rc)*1e3:.3f} ms")
    ec = _agg.vcycle(h, 0, rc)
    print(f"  prolong agg0->fine: "
          f"{timed_op(lambda v: _agg._prolong(lvl0, v), ec)*1e3:.3f} ms")
    print(f"  agg0 operator apply: "
          f"{timed_op(lambda v: _agg._apply(lvl0, v), rc)*1e3:.3f} ms")
    lvl1 = h.levels[1]
    print(f"  level1 restrict(from agg0): "
          f"{timed_op(lambda v: _agg._restrict(lvl1, v), rc)*1e3:.3f} ms")
    rc1 = _agg._restrict(lvl1, rc)
    print(f"  level1 op apply: "
          f"{timed_op(lambda v: _agg._apply(lvl1, v), rc1)*1e3:.3f} ms")
    print(f"  level1 prolong: "
          f"{timed_op(lambda v: _agg._prolong(lvl1, v), rc1)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
