"""Record the residual-history parity artifact HISTORY.json.

Runs the reference-active mode-9 configuration (validation/history.py)
over the mesh zoo on the CPU backend in float64 and writes the per-cycle
residual histories + contraction factors to the repo root.  Commit the
result; tests/test_history.py compares future runs against it.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from p_a_multigrids_tpu.validation import history


def main():
    out = history.record_zoo(history.DEFAULT_SPECS)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "HISTORY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    for k, v in out.items():
        print(f"{k}: rho={v['rho']:.4f} first={v['residual_linf'][0]:.3e} "
              f"last={v['residual_linf'][-1]:.3e}")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
