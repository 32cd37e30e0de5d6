"""Microbenchmarks of the stencil-operator building blocks on the default
device.  Each probe loops inside ONE jit (lax.fori_loop/scan) so remote-TPU
dispatch latency (~1 ms/call through the tunnel) does not pollute the
numbers.

Usage: python scripts/bench_ops.py [mesh.msh] [n_split]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from p_a_multigrids_tpu.config import SemiConfig
from p_a_multigrids_tpu.mesh import topology
from p_a_multigrids_tpu.models import semi as msemi
from p_a_multigrids_tpu.ops import fused as f


def bench_loop(name, step, x0, n=500):
    """Loop inside one jit; sync by fetching a scalar (block_until_ready is
    unreliable through the remote-TPU tunnel, and each dispatch pays a fixed
    ~18 ms round trip that n must amortize)."""
    fn = jax.jit(lambda x: jax.lax.fori_loop(
        0, n, lambda i, v: step(v), x).sum())
    float(fn(x0))
    t0 = time.time()
    float(fn(x0))
    dt = (time.time() - t0) / n
    print(f"{name:24s} {dt * 1e6:10.1f} us/iter")
    return dt


def main():
    mesh_path = (sys.argv[1] if len(sys.argv) > 1
                 else "/root/reference/Mesh_files/untitled8192.msh")
    n_split = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    mesh = topology.from_msh(mesh_path)
    cfg = SemiConfig(n_split=n_split, multi_levels=2, dt=0.05, ntime=1,
                     n_multigrid=1, dtype="float32")
    t0 = time.time()
    problem = msemi.build_problem(mesh, cfg)
    solver = msemi.SemiSolver(problem)
    print(f"setup {time.time() - t0:.2f} s   U={mesh.num_elements} "
          f"C={4 ** n_split}")

    op = solver._stencil[0]
    xt = f.to_t(solver.initial_condition())

    # strip exchange alone (keep output shape = input shape via zero-fold)
    pad_c = op.C - 3 if op.C >= 3 else 0

    def strip_probe(v):
        sv = op.strip(v)                       # (3, nb, U)
        fold = jnp.einsum("cs,jsu->jcu", op.cross_oh, sv)
        return v + 0.0 * fold

    def intra_probe(v):
        xg = jnp.einsum("fcd,jdu->fjcu", op.intra_oh, v)
        return v + 0.0 * (xg[0, 0] + xg[1, 1] + xg[2, 2])[None]

    def fma_probe(v):
        acc = [None] * 3
        for i in range(3):
            for ff in range(3):
                for j in range(3):
                    term = op.Fp_t[ff, i, j] * v[j]
                    acc[i] = term if acc[i] is None else acc[i] + term
        return 0.0 * jnp.stack(acc) + v

    bench_loop("fma27 (coeff traffic)", fma_probe, xt)
    bench_loop("intra one-hot matmuls", intra_probe, xt)
    bench_loop("strip exchange", strip_probe, xt)
    bench_loop("apply (homogeneous)", lambda v: op.apply(v, False), xt)
    bench_loop("sweep step (1 root)",
               lambda v: v + 0.5 * op._z(v, xt), xt)

    T = solver.initial_condition()
    b = solver._rhs(T)

    def cyc(x, _):
        return solver._vcycle(0, x, b), None

    n = 100
    fn = jax.jit(lambda x: jax.lax.scan(cyc, x, None, length=n)[0].sum())
    float(fn(T))
    t0 = time.time()
    float(fn(T))
    print(f"{'V-cycle (in-scan)':24s} {(time.time() - t0) / n * 1e3:10.3f} "
          f"ms")


if __name__ == "__main__":
    main()
