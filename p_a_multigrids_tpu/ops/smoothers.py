"""Relaxation smoothers over abstract operators.

The reference's solver menu (transport_tri_semi.F90:491-518): weighted
Jacobi (omega=0.8, :140), "Gauss-Seidel" (in-place element sweep) and
Richardson.  Sequential GS does not map to SIMD hardware; the TPU-native
replacements are:

- ``jacobi``: damped Jacobi, identical fixed point;
- ``colored_gs``: two-color Gauss-Seidel using the up/down orientation as
  the coloring (neighbors of an up child are down children inside a macro
  element); across macro-element boundaries the sweep is block-Jacobi
  (processor-block GS — the standard distributed-memory variant);
- ``block_jacobi``: exact per-element nloc x nloc solve (DG blocks are tiny
  and dense, so inverting them exactly is cheaper than iterating).

Each smoother takes ``apply_A: (x) -> A x`` (an affine operator is fine —
Dirichlet ghost contributions may be folded in), a right-hand side and a
preconditioner (scalar diagonal or dense blocks).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def jacobi(apply_A: Callable, b: jax.Array, x: jax.Array, diag: jax.Array,
           omega: float = 0.8, sweeps: int = 1) -> jax.Array:
    def body(x, _):
        x = x + omega / diag * (b - apply_A(x))
        return x, None
    x, _ = jax.lax.scan(body, x, None, length=sweeps)
    return x


def richardson(apply_A: Callable, b: jax.Array, x: jax.Array,
               omega: float = 0.8, sweeps: int = 1) -> jax.Array:
    def body(x, _):
        return x + omega * (b - apply_A(x)), None
    x, _ = jax.lax.scan(body, x, None, length=sweeps)
    return x


def block_jacobi(apply_A: Callable, b: jax.Array, x: jax.Array,
                 diag_blocks: jax.Array, omega: float = 1.0,
                 sweeps: int = 1) -> jax.Array:
    """x <- x + omega * D^{-1} (b - A x) with exact dense block solves.

    diag_blocks: (..., nloc, nloc) matching x (..., nloc).
    """
    def body(x, _):
        r = b - apply_A(x)
        dx = jnp.linalg.solve(diag_blocks, r[..., None])[..., 0]
        return x + omega * dx, None
    x, _ = jax.lax.scan(body, x, None, length=sweeps)
    return x


def colored_gs(apply_A: Callable, b: jax.Array, x: jax.Array,
               diag: jax.Array, color_masks: tuple[jax.Array, ...],
               omega: float = 0.8, sweeps: int = 1) -> jax.Array:
    """Multi-color Gauss-Seidel: update one color at a time, each color seeing
    the freshly updated values of previously swept colors.

    color_masks: boolean masks (broadcastable to x) partitioning the rows.
    """
    def body(x, _):
        for mask in color_masks:
            x = jnp.where(mask, x + omega / diag * (b - apply_A(x)), x)
        return x, None
    x, _ = jax.lax.scan(body, x, None, length=sweeps)
    return x
