"""Sanitizer/debug mode (utils/debugging + SemiConfig.debug).

The reference's sanitizer story is gfortran -fbounds-check on a serial
debug build (/root/reference/Makefile:8); here the equivalent is checkify
instrumentation of the same jitted solver graphs.
"""

import numpy as np
import pytest
from jax.experimental import checkify

from p_a_multigrids_tpu.config import ProblemFns, SemiConfig
from p_a_multigrids_tpu.mesh import structured
from p_a_multigrids_tpu.models import semi
from p_a_multigrids_tpu.utils import debugging


def _mesh():
    return structured.tri_mesh(3, 3, 1.0 / 3, 1.0 / 3)


def test_debug_mode_clean_run_passes():
    """A healthy solve under debug=True runs, raises nothing, and matches
    the uninstrumented solve exactly (same graph, only instrumented)."""
    cfg = SemiConfig(n_split=1, multi_levels=1, ntime=1, dt=1e3,
                     n_multigrid=2, dtype="float64")
    mesh = _mesh()
    _, T_ref = semi.solve(mesh, cfg)
    import dataclasses
    solver_dbg, T_dbg = semi.solve(
        mesh, dataclasses.replace(cfg, debug=True))
    np.testing.assert_allclose(np.asarray(T_dbg), np.asarray(T_ref),
                               rtol=0, atol=0)
    assert np.isfinite(np.asarray(T_dbg)).all()


def test_debug_mode_catches_nan():
    """A NaN injected through the initial condition must raise, not
    propagate silently (float_checks: NaN generation in the first add)."""
    cfg = SemiConfig(
        n_split=1, multi_levels=1, ntime=1, dt=1e3, n_multigrid=1,
        dtype="float64", debug=True,
        fns=ProblemFns(ic=lambda x, y: np.where(
            x > 10.0, 0.0, np.nan) + 0 * x))
    solver = semi.SemiSolver(semi.build_problem(_mesh(), cfg))
    with pytest.raises(checkify.JaxRuntimeError):
        solver.run()


def test_assert_finite_helper():
    debugging.assert_finite(np.ones(4), "ok")
    with pytest.raises(FloatingPointError, match="2/4"):
        debugging.assert_finite(np.array([1.0, np.nan, np.inf, 0.0]), "bad")


def test_checked_wrapper_oob_index():
    """index_checks: an out-of-bounds gather raises (the -fbounds-check
    equivalent on the static index tables)."""
    import jax.numpy as jnp

    def f(x):
        idx = jnp.array([0, 5], dtype=jnp.int32)   # 5 is OOB for size 3
        return x[idx].sum()

    g = debugging.checked(f)
    with pytest.raises(checkify.JaxRuntimeError):
        g(jnp.arange(3.0))
