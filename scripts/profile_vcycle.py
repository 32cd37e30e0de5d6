"""Component-level timing of the flagship V-cycle on the real TPU.

Times each building block of SemiSolver._vcycle separately (jitted, with
donation where the real cycle would reuse buffers) to locate the hot spot.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from p_a_multigrids_tpu.config import SemiConfig
from p_a_multigrids_tpu.mesh import topology
from p_a_multigrids_tpu.models import semi as msemi
from p_a_multigrids_tpu.ops import fused as _fused


def timeit(name, fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:40s} {dt * 1e6:10.1f} us")
    return out


def main():
    mesh = topology.from_msh("/root/reference/Mesh_files/untitled8192.msh")
    cfg = SemiConfig(n_split=2, multi_levels=2, dt=0.05, ntime=1,
                     n_multigrid=1, dtype="float32")
    t0 = time.time()
    problem = msemi.build_problem(mesh, cfg)
    solver = msemi.SemiSolver(problem)
    print(f"setup: {time.time() - t0:.1f}s")

    T = solver.initial_condition()
    b = solver._rhs(T)
    op0, op1 = solver._stencil
    xt = _fused.to_t(T)
    bt = _fused.to_t(b)

    timeit("fine apply (stencil)", jax.jit(lambda x: op0.apply(x, True)), xt)
    timeit("fine strip gather", jax.jit(op0.strip), xt)
    timeit("fine smooth 1x cheb(6)",
           jax.jit(lambda x, b_: op0.smooth_chebyshev(
               x, b_, solver._cheb_roots(0), 1, True)), xt, bt)
    timeit("to_t + from_t", jax.jit(lambda x: _fused.from_t(_fused.to_t(x))),
           T)
    timeit("restrict", jax.jit(lambda r: msemi.restrict(r, 1)), b)
    rc = msemi.restrict(b, 1)
    timeit("prolong", jax.jit(lambda e: msemi.prolong(e, 1)), rc)
    xtc = _fused.to_t(rc)
    btc = xtc
    timeit("coarse apply", jax.jit(lambda x: op1.apply(x, False)), xtc)
    timeit("coarse smooth 2x cheb(6)",
           jax.jit(lambda x, b_: op1.smooth_chebyshev(
               x, b_, solver._cheb_roots(1), 2, False)), xtc, btc)
    timeit("full smooth li=0 (n_smooth)",
           jax.jit(lambda x, b_: solver._smooth(0, x, b_, cfg.n_smooth,
                                                True)), T, b)
    timeit("full vcycle", jax.jit(lambda x, b_: solver._vcycle(0, x, b_)),
           T, b, reps=20)


if __name__ == "__main__":
    main()
