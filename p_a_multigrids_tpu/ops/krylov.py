"""Preconditioned Krylov solvers (jittable, fixed-shape state).

The reference has no Krylov method at all — its implicit modes densify the
CSR operator and invert with O(N^3) Gauss-Jordan (``FINDInv``,
/root/reference/matrices.F90:1618-1716, used from transport_tri.F90:321,
amin.F90:374-386).  These replace that path at scale: preconditioned CG for
the SPD diffusion systems and BiCGStab for nonsymmetric advective ones,
with a multigrid V-cycle or block-Jacobi preconditioner.  All control flow
is ``lax.while_loop`` so a solve is one XLA computation.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _dot(a, b):
    return jnp.vdot(a.reshape(-1), b.reshape(-1))


def pcg(apply_A: Callable, b: jax.Array, x0: jax.Array,
        precond: Callable | None = None, tol: float = 1e-8,
        maxiter: int = 200):
    """Preconditioned conjugate gradients for SPD systems.

    Returns (x, iterations, final_residual_norm).
    """
    M = precond or (lambda r: r)
    bnorm = jnp.sqrt(_dot(b, b).real)
    atol = tol * jnp.maximum(bnorm, 1e-30)

    r0 = b - apply_A(x0)
    z0 = M(r0)
    state = (x0, r0, z0, z0, _dot(r0, z0), jnp.asarray(0))

    def cond(s):
        x, r, z, p, rz, it = s
        return (jnp.sqrt(_dot(r, r).real) > atol) & (it < maxiter)

    def body(s):
        x, r, z, p, rz, it = s
        Ap = apply_A(p)
        alpha = rz / _dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1)

    x, r, *_, it = jax.lax.while_loop(cond, body, state)
    return x, it, jnp.sqrt(_dot(r, r).real)


def bicgstab(apply_A: Callable, b: jax.Array, x0: jax.Array,
             precond: Callable | None = None, tol: float = 1e-8,
             maxiter: int = 200):
    """Preconditioned BiCGStab for general (nonsymmetric) systems."""
    M = precond or (lambda r: r)
    bnorm = jnp.sqrt(_dot(b, b).real)
    atol = tol * jnp.maximum(bnorm, 1e-30)

    r0 = b - apply_A(x0)
    rhat = r0
    state = (x0, r0, r0, jnp.ones((), b.dtype), jnp.ones((), b.dtype),
             jnp.ones((), b.dtype), jnp.zeros_like(b), jnp.zeros_like(b),
             jnp.asarray(0))

    def cond(s):
        x, r, rhat_, rho, alpha, omega, v, p, it = s
        return (jnp.sqrt(_dot(r, r).real) > atol) & (it < maxiter)

    def body(s):
        x, r, rhat_, rho, alpha, omega, v, p, it = s
        rho_new = _dot(rhat_, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = apply_A(phat)
        alpha = rho_new / _dot(rhat_, v)
        s_vec = r - alpha * v
        shat = M(s_vec)
        t = apply_A(shat)
        omega = _dot(t, s_vec) / _dot(t, t)
        x = x + alpha * phat + omega * shat
        r = s_vec - omega * t
        return (x, r, rhat_, rho_new, alpha, omega, v, p, it + 1)

    x, r, *_, it = jax.lax.while_loop(cond, body, state)
    return x, it, jnp.sqrt(_dot(r, r).real)
