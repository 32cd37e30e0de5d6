"""Dense and banded solver kit (jittable).

Counterpart of the reference's LinearSolvers.F90 (not compiled into its
binary, but part of the documented solver inventory: solver_gauss :40,
solver_Thomas :387, solver_BlockThomas :352, fact_PLU/solver_PLU :502,482)
and of matrices.F90's FINDInv Gauss-Jordan inverse (:1618-1716).

On TPU, small dense solves go through jnp.linalg (LAPACK-grade, batched);
the tridiagonal and block-tridiagonal solvers are sequential recurrences
expressed with lax.scan so they jit into single fused loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gauss_solve(A: jax.Array, b: jax.Array) -> jax.Array:
    """Dense solve (replaces solver_gauss / solver_GaussP; batched)."""
    return jnp.linalg.solve(A, b)


def invert(A: jax.Array) -> jax.Array:
    """Dense inverse (replaces FINDInv, matrices.F90:1618; batched)."""
    return jnp.linalg.inv(A)


def lu_factor(A: jax.Array):
    """PLU factorization (fact_PLU equivalent)."""
    import jax.scipy.linalg as jsl
    return jsl.lu_factor(A)


def lu_solve(factors, b: jax.Array) -> jax.Array:
    import jax.scipy.linalg as jsl
    return jsl.lu_solve(factors, b)


def thomas(lower: jax.Array, diag: jax.Array, upper: jax.Array,
           rhs: jax.Array) -> jax.Array:
    """Tridiagonal solve via the Thomas algorithm (solver_Thomas :387).

    Args:
      lower: (n,) sub-diagonal (lower[0] unused)
      diag:  (n,) main diagonal
      upper: (n,) super-diagonal (upper[-1] unused)
      rhs:   (n,) or (n, k)
    """
    n = diag.shape[0]
    rhs2 = rhs if rhs.ndim > 1 else rhs[:, None]

    def fwd(carry, x):
        cp_prev, dp_prev = carry
        a, b, c, d = x
        denom = b - a * cp_prev
        cp = c / denom
        dp = (d - a * dp_prev) / denom
        return (cp, dp), (cp, dp)

    xs = (lower, diag, upper, rhs2)
    init = (jnp.zeros((), diag.dtype), jnp.zeros((rhs2.shape[1],),
                                                 rhs2.dtype))
    _, (cps, dps) = jax.lax.scan(fwd, init, xs)

    def bwd(x_next, x):
        cp, dp = x
        xcur = dp - cp * x_next
        return xcur, xcur

    _, sol = jax.lax.scan(bwd, jnp.zeros((rhs2.shape[1],), rhs2.dtype),
                          (cps, dps), reverse=True)
    return sol if rhs.ndim > 1 else sol[:, 0]


def block_thomas(lower: jax.Array, diag: jax.Array, upper: jax.Array,
                 rhs: jax.Array) -> jax.Array:
    """Block-tridiagonal solve (solver_BlockThomas :352).

    Args:
      lower/diag/upper: (n, b, b) block bands (lower[0], upper[-1] unused)
      rhs: (n, b)
    """
    def fwd(carry, x):
        Cp_prev, Dp_prev = carry
        A, B, C, D = x
        denom = B - A @ Cp_prev
        Cp = jnp.linalg.solve(denom, C)
        Dp = jnp.linalg.solve(denom, D - A @ Dp_prev)
        return (Cp, Dp), (Cp, Dp)

    b = diag.shape[-1]
    init = (jnp.zeros((b, b), diag.dtype), jnp.zeros((b,), rhs.dtype))
    _, (Cps, Dps) = jax.lax.scan(fwd, init, (lower, diag, upper, rhs))

    def bwd(x_next, x):
        Cp, Dp = x
        xcur = Dp - Cp @ x_next
        return xcur, xcur

    _, sol = jax.lax.scan(bwd, jnp.zeros((b,), rhs.dtype), (Cps, Dps),
                          reverse=True)
    return sol
