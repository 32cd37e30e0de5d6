"""Fused Pallas relaxation-phase kernels == the XLA stencil path.

Runs in Pallas interpret mode on the CPU test mesh; the kernel logic
(VMEM ping-pong over rounds, banded in-kernel strip exchange, one-hot
gathers) is identical to what compiles on TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from p_a_multigrids_tpu.config import Physics, SemiConfig
from p_a_multigrids_tpu.mesh import topology
from p_a_multigrids_tpu.models import semi as msemi
from p_a_multigrids_tpu.ops import pallas_stencil as ps
from p_a_multigrids_tpu.ops.fused import to_t

MESH = "/root/reference/Mesh_files/test_sn2.msh"


def _solver(pallas, phys=None, n_split=2, levels=2):
    mesh = topology.from_msh(MESH)
    cfg = SemiConfig(n_split=n_split, multi_levels=levels, dt=0.05,
                     dtype="float64", pallas_phase=pallas,
                     physics=phys or Physics())
    return msemi.SemiSolver(msemi.build_problem(mesh, cfg))


def test_phase_matches_chebyshev_sweep():
    solver = _solver(True)
    assert solver._phase is not None
    op = solver._stencil[0]
    ph = solver._phase[0]
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(3, op.C, op.U)))
    b = jnp.asarray(rng.normal(size=(3, op.C, op.U)))

    coefs = solver._phase_coefs(0, solver.cfg.n_smooth)
    bp = op._bp(b, True)
    x_ph, z = ph.phase(x, bp, coefs)

    x_ref = op.smooth_chebyshev(x, b, solver._cheb_roots(0), 1, True)
    np.testing.assert_allclose(np.asarray(x_ph), np.asarray(x_ref),
                               rtol=1e-12, atol=1e-12)
    # z = D^-1 (b - A x_final); mul_self recovers the true residual
    r_ref = np.asarray(b - op.apply(x_ref, True))
    np.testing.assert_allclose(np.asarray(ph.mul_self(z)), r_ref,
                               rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("phys_name", ["diffusion", "advect"])
def test_vcycle_pallas_matches_xla(phys_name):
    phys = (Physics() if phys_name == "diffusion"
            else Physics(advection=True, u=(0.4, -0.2)))
    s_pl = _solver(True, phys)
    s_xla = _solver(False, phys)
    assert s_pl._phase is not None and s_xla._phase is None
    T0 = s_pl.initial_condition()
    a = np.asarray(s_pl._step(T0))
    b = np.asarray(s_xla._step(T0))
    np.testing.assert_allclose(a, b, rtol=1e-11, atol=1e-12)


@pytest.mark.parametrize("impl", ["resident", "stream", "coef_resident"])
@pytest.mark.parametrize("n_split", [2, 3])
def test_phase_impls_match_stencil(impl, n_split):
    """Both kernel implementations == the XLA stencil smoother, including
    at deeper n_split (the resident lattice kernel's target regime)."""
    phys = Physics(advection=True, u=(0.3, 0.1))
    solver = _solver(False, phys, n_split=n_split, levels=1)
    op = solver._stencil[0]
    ph = ps.make_phase(op, interpret=True, impl=impl)
    assert ph is not None
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(3, op.C, op.U)))
    b = jnp.asarray(rng.normal(size=(3, op.C, op.U)))
    coefs = [0.8] * 3
    bp = op._bp(b, False)
    x_ph, z = ph.phase(x, bp, coefs)
    x_ref = op.smooth_jacobi(x, b, 0.8, 3, False)
    np.testing.assert_allclose(np.asarray(x_ph), np.asarray(x_ref),
                               rtol=1e-12, atol=1e-12)
    r_ref = np.asarray(b - op.apply(x_ref, False))
    np.testing.assert_allclose(np.asarray(ph.mul_self(z)), r_ref,
                               rtol=1e-11, atol=1e-11)


def test_auto_selection():
    """auto: streaming V1 only on its safe+fast shapes (C <= 64 AND a
    lane-tileable macro axis); the resident lattice kernel otherwise."""
    # zoo mesh: U=12 is not lane-tileable -> resident
    solver = _solver(True)
    assert all(type(p).__name__ == "PhaseOperatorResident"
               for p in solver._phase)
    # lane-tileable U + small C -> streaming
    from p_a_multigrids_tpu.config import SemiConfig
    from p_a_multigrids_tpu.mesh import structured
    mesh = structured.tri_mesh(16, 4, 0.25, 0.25)      # U = 128
    cfg = SemiConfig(n_split=2, multi_levels=1, dt=0.05,
                     dtype="float64", pallas_phase=True)
    s2 = msemi.SemiSolver(msemi.build_problem(mesh, cfg))
    assert type(s2._phase[0]).__name__ == "PhaseOperatorCoefResident"
    # deep split (C > 64) -> resident even on tileable U
    cfg3 = SemiConfig(n_split=4, multi_levels=1, dt=0.05,
                      dtype="float64", pallas_phase=True)
    s3 = msemi.SemiSolver(msemi.build_problem(mesh, cfg3))
    assert type(s3._phase[0]).__name__ == "PhaseOperatorResident"


def test_phase_after_rcm_reorder():
    """RCM reorder + pallas path still passes the manufactured gate."""
    mesh = topology.rcm_reorder(topology.from_msh(MESH))
    cfg = SemiConfig(n_split=2, multi_levels=2, dt=1e8, ntime=2,
                     n_multigrid=4, dtype="float64", pallas_phase=True)
    solver, T = msemi.solve(mesh, cfg)
    assert solver._phase is not None
    err = np.asarray(solver.error(T))
    assert err.mean() < 0.01
