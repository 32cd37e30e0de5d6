"""Minimal repro: the STREAMING phase kernel crashes the TPU AOT compiler.

Round-3 observations (commit e611632/6e219fa, VERDICT r3 weak #4): the
V1 streaming kernel (ops/pallas_stencil.PhaseOperator) deterministically
kills the remote AOT compile at
  (a) C >= 256 (deep n_split), and
  (b) single-tile configurations with U % 128 != 0.
make_phase's auto rule avoids those shapes (resident kernel instead); this
script reproduces each case in isolation so the upstream failure can be
reported/bisected.  Run on the real TPU:

    python scripts/repro_stream_aot.py [case_a|case_b]

Each case builds ONE pallas_call and jits a single phase; a crash
manifests as a Mosaic/XLA internal error (or an HTTP 500 from the remote
compile helper), not a Python exception from this code.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import numpy as np


def run_case(n_split, rows, cols, label):
    import jax
    import jax.numpy as jnp

    from p_a_multigrids_tpu.config import SemiConfig
    from p_a_multigrids_tpu.mesh import structured
    from p_a_multigrids_tpu.models import semi as msemi
    from p_a_multigrids_tpu.ops import pallas_stencil as _ps

    mesh = structured.tri_mesh(rows, cols, 1.0 / rows, 1.0 / cols)
    cfg = SemiConfig(n_split=n_split, multi_levels=1, dt=0.05,
                     dtype="float32", pallas_phase=False)
    solver = msemi.SemiSolver(msemi.build_problem(mesh, cfg))
    op = solver._stencil[0]
    print(f"[{label}] U={op.U} C={op.C}", flush=True)
    ph = _ps.PhaseOperator(op)          # force the streaming kernel
    print(f"[{label}] kernel built: TU={ph.TU} T={ph.T} W={ph.W}",
          flush=True)
    x = jnp.zeros((3, op.C, op.U), jnp.float32)
    bp = jnp.zeros_like(x)
    fn = jax.jit(lambda a, b: ph.phase(a, b, [0.8] * 3)[0])
    print(f"[{label}] compiling...", flush=True)
    out = fn(x, bp)
    out.block_until_ready()
    print(f"[{label}] OK (no crash) — finite: "
          f"{bool(jnp.isfinite(out).all())}", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("case_a", "both"):
        # C = 256 (n_split 4), lane-tileable U — round 3's sweep shapes
        run_case(4, 16, 8, "case_a C=256")
    if which in ("case_b", "both"):
        # C = 16, U = 12 not a 128 multiple -> single whole-axis tile
        run_case(2, 3, 2, "case_b U%128!=0")


if __name__ == "__main__":
    main()
