"""Krylov solvers: convergence + breakdown safety (NaN-free guarantees)."""

import numpy as np

import jax.numpy as jnp

from p_a_multigrids_tpu.ops import krylov


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    Q = np.linalg.qr(rng.normal(size=(n, n)))[0]
    A = Q @ np.diag(rng.uniform(0.5, 10.0, n)) @ Q.T
    return jnp.asarray(A)


def test_pcg_solves_spd():
    A = _spd(40)
    x_true = jnp.asarray(np.random.default_rng(1).normal(size=40))
    b = A @ x_true
    x, it, rn = krylov.pcg(lambda v: A @ v, b, jnp.zeros_like(b),
                           tol=1e-12, maxiter=200)
    assert float(rn) < 1e-9
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=1e-7, atol=1e-8)


def test_bicgstab_solves_nonsymmetric():
    rng = np.random.default_rng(2)
    n = 40
    A = jnp.asarray(np.eye(n) * 4.0 + 0.8 * rng.normal(size=(n, n)))
    x_true = jnp.asarray(rng.normal(size=n))
    b = A @ x_true
    x, it, rn = krylov.bicgstab(lambda v: A @ v, b, jnp.zeros_like(b),
                                tol=1e-12, maxiter=400)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=1e-6, atol=1e-7)


def test_pcg_indefinite_operator_stops_finite():
    """<p, Ap> <= 0 (not SPD) must freeze, not diverge to NaN."""
    d = jnp.asarray(np.concatenate([np.ones(10), -np.ones(10)]))
    b = jnp.asarray(np.random.default_rng(3).normal(size=20))
    x, it, rn = krylov.pcg(lambda v: d * v, b, jnp.zeros_like(b),
                           tol=1e-12, maxiter=100)
    assert np.isfinite(np.asarray(x)).all()
    assert np.isfinite(float(rn))


def test_bicgstab_singular_preconditioner_nan_free():
    """A rank-deficient preconditioner (zeroing half the components) must
    never produce NaN — the guarded divisions stall gracefully."""
    rng = np.random.default_rng(4)
    n = 30
    A = jnp.asarray(np.eye(n) * 3.0 + 0.5 * rng.normal(size=(n, n)))
    b = jnp.asarray(rng.normal(size=n))
    mask = jnp.asarray((np.arange(n) < n // 2).astype(np.float64))
    M = lambda r: mask * r          # singular: kills half the space
    x, it, rn = krylov.bicgstab(lambda v: A @ v, b, jnp.zeros_like(b),
                                precond=M, tol=1e-10, maxiter=200)
    assert np.isfinite(np.asarray(x)).all()
    assert np.isfinite(float(rn))


def test_bicgstab_skew_dominated_never_diverges():
    """Nearly-skew (advection-dominated) operator: unguarded BiCGStab
    explodes to ~1e13 here; the guarded version must return a finite
    iterate whose residual never exceeds the starting one (best-iterate
    tracking + step rejection)."""
    n = 24
    S = np.zeros((n, n))
    for i in range(n - 1):
        S[i, i + 1], S[i + 1, i] = 1.0, -1.0
    A = jnp.asarray(np.eye(n) * 0.05 + S)
    x_true = jnp.asarray(np.random.default_rng(5).normal(size=n))
    b = A @ x_true
    x, it, rn = krylov.bicgstab(lambda v: A @ v, b, jnp.zeros_like(b),
                                tol=1e-10, maxiter=2000)
    assert np.isfinite(np.asarray(x)).all()
    assert float(rn) <= float(jnp.linalg.norm(b)) * (1 + 1e-9)


def test_bicgstab_advective_preconditioned_converges():
    """The production shape: advective system with a (here exact-inverse)
    preconditioner, converging through the guarded iteration."""
    n = 24
    S = np.zeros((n, n))
    for i in range(n - 1):
        S[i, i + 1], S[i + 1, i] = 1.0, -1.0
    A_np = np.eye(n) * 0.05 + S
    A = jnp.asarray(A_np)
    Minv = jnp.asarray(np.linalg.inv(A_np + 0.3 * np.eye(n)))
    x_true = jnp.asarray(np.random.default_rng(6).normal(size=n))
    b = A @ x_true
    x, it, rn = krylov.bicgstab(lambda v: A @ v, b, jnp.zeros_like(b),
                                precond=lambda r: Minv @ r,
                                tol=1e-10, maxiter=500)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=1e-5, atol=1e-6)


def test_pcg_zero_rhs():
    A = _spd(10)
    b = jnp.zeros(10)
    x, it, rn = krylov.pcg(lambda v: A @ v, b, jnp.zeros_like(b))
    assert float(rn) == 0.0 and int(it) == 0
