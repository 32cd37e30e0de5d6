"""Preconditioned Krylov solvers (jittable, fixed-shape state).

The reference has no Krylov method at all — its implicit modes densify the
CSR operator and invert with O(N^3) Gauss-Jordan (``FINDInv``,
/root/reference/matrices.F90:1618-1716, used from transport_tri.F90:321,
amin.F90:374-386).  These replace that path at scale: preconditioned CG for
the SPD diffusion systems and BiCGStab for nonsymmetric advective ones,
with a multigrid V-cycle or block-Jacobi preconditioner.  All control flow
is ``lax.while_loop`` so a solve is one XLA computation.

Breakdown safety: every division is guarded (``_safe_div`` returns 0 on a
vanishing denominator instead of NaN) and BiCGStab re-anchors its shadow
residual when the Lanczos biorthogonality degenerates (rho ~ 0), so a
singular preconditioner or an unlucky start stagnates instead of poisoning
the state with NaN (tests/test_krylov.py exercises both).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _dot(a, b):
    return jnp.vdot(a.reshape(-1), b.reshape(-1))


def _safe_div(a, b):
    """a / b, but 0 where the denominator is (near-)zero or non-finite."""
    bad = (jnp.abs(b) < jnp.finfo(jnp.result_type(b)).tiny * 1e3) | \
        ~jnp.isfinite(b)
    return jnp.where(bad, jnp.zeros_like(a), a / jnp.where(bad, 1.0, b))


def pcg(apply_A: Callable, b: jax.Array, x0: jax.Array,
        precond: Callable | None = None, tol: float = 1e-8,
        maxiter: int = 200, dot: Callable | None = None):
    """Preconditioned conjugate gradients for SPD systems.

    ``dot`` overrides the inner product — the distributed solver passes a
    psum-reduced dot so the same iteration runs inside shard_map.
    Returns (x, iterations, final_residual_norm).
    """
    _dot = dot or globals()["_dot"]
    M = precond or (lambda r: r)
    bnorm = jnp.sqrt(_dot(b, b).real)
    atol = tol * jnp.maximum(bnorm, 1e-30)

    r0 = b - apply_A(x0)
    z0 = M(r0)
    ok0 = jnp.asarray(True)
    state = (x0, r0, z0, z0, _dot(r0, z0), ok0, jnp.asarray(0))

    def cond(s):
        x, r, z, p, rz, ok, it = s
        return (jnp.sqrt(_dot(r, r).real) > atol) & ok & (it < maxiter)

    def body(s):
        x, r, z, p, rz, ok, it = s
        Ap = apply_A(p)
        pAp = _dot(p, Ap)
        alpha = _safe_div(rz, pAp)
        # <p, Ap> <= 0 means A (or M) is not SPD on this subspace — a true
        # CG breakdown: freeze the iterate and stop instead of diverging
        ok = ok & (pAp.real > 0) & jnp.isfinite(alpha)
        alpha = jnp.where(ok, alpha, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _dot(r, z)
        beta = _safe_div(rz_new, rz)
        p = z + beta * p
        return (x, r, z, p, rz_new, ok, it + 1)

    x, r, *_, it = jax.lax.while_loop(cond, body, state)
    return x, it, jnp.sqrt(_dot(r, r).real)


def bicgstab(apply_A: Callable, b: jax.Array, x0: jax.Array,
             precond: Callable | None = None, tol: float = 1e-8,
             maxiter: int = 200, dot: Callable | None = None):
    """Preconditioned BiCGStab for general (nonsymmetric) systems.

    Guarded against the classical breakdowns: when the shadow product
    rho = <rhat, r> degenerates the shadow residual is re-anchored at the
    current residual (a restart — the standard remedy), and the
    <rhat, v> / <t, t> divisions return 0 instead of NaN so a stalled step
    leaves the iterate unchanged.  ``dot`` as in :func:`pcg`.
    """
    _dot = dot or globals()["_dot"]
    M = precond or (lambda r: r)
    bnorm = jnp.sqrt(_dot(b, b).real)
    atol = tol * jnp.maximum(bnorm, 1e-30)

    r0 = b - apply_A(x0)
    rhat = r0
    rn0 = jnp.sqrt(_dot(r0, r0).real)
    one = jnp.ones((), b.dtype)
    state = (x0, r0, rhat, one, one, one, jnp.zeros_like(b),
             jnp.zeros_like(b), x0, rn0, jnp.asarray(0))

    def cond(s):
        r, rn_best, it = s[1], s[-2], s[-1]
        rnorm = jnp.sqrt(_dot(r, r).real)
        return (rn_best > atol) & (rnorm > atol) & (it < maxiter)

    def body(s):
        x, r, rhat_, rho, alpha, omega, v, p, x_best, rn_best, it = s
        rho_new = _dot(rhat_, r)
        rr = _dot(r, r)
        # Lanczos breakdown (|<rhat, r>| << |r|^2): restart with rhat = r
        restart = jnp.abs(rho_new) < 1e-12 * jnp.abs(rr)
        rhat_ = jnp.where(restart, r, rhat_)
        rho_new = jnp.where(restart, rr, rho_new)
        beta = jnp.where(restart, jnp.zeros_like(rho_new),
                         _safe_div(rho_new, rho) * _safe_div(alpha, omega))
        v = jnp.where(restart, jnp.zeros_like(v), v)
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = apply_A(phat)
        alpha = _safe_div(rho_new, _dot(rhat_, v))
        s_vec = r - alpha * v
        shat = M(s_vec)
        t = apply_A(shat)
        omega = _safe_div(_dot(t, s_vec), _dot(t, t))
        x_n = x + alpha * phat + omega * shat
        r_n = s_vec - omega * t
        rn_n = jnp.sqrt(_dot(r_n, r_n).real)
        # step rejection: a non-finite or exploding step (>1e4 x the best
        # residual so far — far beyond BiCGStab's normal nonmonotonicity)
        # keeps the previous iterate and forces a clean restart next round
        bad = ~jnp.isfinite(rn_n) | (rn_n > 1e4 * jnp.maximum(rn_best,
                                                              atol))
        x = jnp.where(bad, x, x_n)
        r = jnp.where(bad, r, r_n)
        v = jnp.where(bad, jnp.zeros_like(v), v)
        p = jnp.where(bad, jnp.zeros_like(p), p)
        rhat_ = jnp.where(bad, r, rhat_)
        alpha = jnp.where(bad, one, alpha)
        omega = jnp.where(bad, one, omega)
        rho_new = jnp.where(bad, one, rho_new)
        rn_cur = jnp.where(bad, jnp.sqrt(_dot(r, r).real), rn_n)
        better = rn_cur < rn_best
        x_best = jnp.where(better, x, x_best)
        rn_best = jnp.where(better, rn_cur, rn_best)
        return (x, r, rhat_, rho_new, alpha, omega, v, p, x_best, rn_best,
                it + 1)

    out = jax.lax.while_loop(cond, body, state)
    x_best, rn_best, it = out[-3], out[-2], out[-1]
    return x_best, it, rn_best
