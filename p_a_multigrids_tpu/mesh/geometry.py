"""Batched element geometry kernels (jit/vmap over whole element arrays).

The reference computes per-element Jacobians one element at a time inside its
hot loops (`tri_det_nlx` /root/reference/ShapFun.F90:1389-1530, `det_snlx_all`
:1534-1632, called per element per time step). Here all geometry is one
batched einsum over the whole mesh, evaluated once at setup (static meshes) —
the per-step cost disappears and the arrays live in HBM ready for fused
consumption by assembly/smoother kernels.

Weight convention matches the reference: ``detwei = 0.5*|detJ|*w`` for
triangles (ShapFun.F90:1436) so that ``sum(detwei) == element area``, and
``sdetwei = |dx/dl|*sw`` with ``sum(sdetwei) == edge length``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def tri_det_nlx(x_loc: jax.Array, nlx: jax.Array, weight: jax.Array):
    """Batched triangle Jacobians.

    Args:
      x_loc:  (..., 2, nloc) vertex coordinates (ndim=2 rows, node columns)
      nlx:    (ngi, 2, nloc) local derivatives of shape functions
      weight: (ngi,) quadrature weights

    Returns:
      detwei: (..., ngi)           0.5*|detJ|*w
      nx:     (..., ngi, 2, nloc)  physical derivatives
      inv_jac:(..., ngi, 2, 2)     the A-matrix of ShapFun.F90:1438-1448
    """
    # J[gi, a, b] = sum_l nlx[gi, a, l] * x[b, l]
    jac = jnp.einsum("gal,...bl->...gab", nlx, x_loc)
    detj = jac[..., 0, 0] * jac[..., 1, 1] - jac[..., 0, 1] * jac[..., 1, 0]
    detwei = 0.5 * jnp.abs(detj) * weight
    inv = jnp.stack(
        [
            jnp.stack([jac[..., 1, 1], -jac[..., 0, 1]], axis=-1),
            jnp.stack([-jac[..., 1, 0], jac[..., 0, 0]], axis=-1),
        ],
        axis=-2,
    ) / detj[..., None, None]
    # reference stores A with A12/A21 swapped relative to the algebraic
    # inverse (INV_JAC(1,2)=A21 etc., ShapFun.F90:1444-1448); what matters is
    # the contraction used for nx (ShapFun.F90:1451-1452):
    #   nx[1] = (D*nlx1 - B*nlx2)/det ; nx[2] = (-C*nlx1 + A*nlx2)/det
    # which is exactly inv @ nlx with inv as built above.
    nx = jnp.einsum("...gab,gbl->...gal", inv, nlx)
    return detwei, nx, inv


def det_snlx(xsl: jax.Array, snlx: jax.Array, sweight: jax.Array,
             approx_norm: jax.Array):
    """Batched edge geometry: sdetwei and outward unit normals.

    Args:
      xsl:        (..., 2, snloc) edge endpoint coordinates
      snlx:       (sngi, 1, snloc) surface local derivatives
      sweight:    (sngi,)
      approx_norm:(..., 2) any vector pointing outward (e.g. face centroid
                  minus element centroid) used only to fix the normal's sign
                  (NORMGI, ShapFun.F90:2012-2056).

    Returns:
      sdetwei: (..., sngi)
      snorm:   (..., sngi, 2) unit outward normal at each surface point
    """
    # tangent t[gi, b] = sum_l snlx[gi, 0, l] * x[b, l]
    t = jnp.einsum("gl,...bl->...gb", snlx[:, 0, :], xsl)
    detj = jnp.sqrt(jnp.sum(t * t, axis=-1))
    sdetwei = detj * sweight
    # rotate tangent by 90deg: n = (ty, -tx)/|t|
    n = jnp.stack([t[..., 1], -t[..., 0]], axis=-1) / detj[..., None]
    sign = jnp.sign(jnp.sum(n * approx_norm[..., None, :], axis=-1))
    sign = jnp.where(sign == 0, 1.0, sign)
    return sdetwei, n * sign[..., None]


def quad_det_nlx(x_loc: jax.Array, nlx: jax.Array, weight: jax.Array):
    """Batched quad Jacobians (det_nlx for quads, ShapFun.F90:1245-1386).

    Same contract as tri_det_nlx but with the full-|detJ| weight convention
    (no 0.5 factor; quads use unit-square reference measure 1).
    """
    jac = jnp.einsum("gal,...bl->...gab", nlx, x_loc)
    detj = jac[..., 0, 0] * jac[..., 1, 1] - jac[..., 0, 1] * jac[..., 1, 0]
    detwei = jnp.abs(detj) * weight
    inv = jnp.stack(
        [
            jnp.stack([jac[..., 1, 1], -jac[..., 0, 1]], axis=-1),
            jnp.stack([-jac[..., 1, 0], jac[..., 0, 0]], axis=-1),
        ],
        axis=-2,
    ) / detj[..., None, None]
    nx = jnp.einsum("...gab,gbl->...gal", inv, nlx)
    return detwei, nx, inv


def semi_level_scalings(detwei_macro, nx_macro, sdetwei_macro, n_split: int,
                        multi_levels: int):
    """Per-level geometry for the nested 4**k hierarchy.

    A child at split depth ``s = n_split - ilevel + 1`` (ilevel=1 is finest)
    is a scaled copy of its macro triangle, so (ShapFun.F90:1681-1682,
    1769-1770):

        detwei_level  = detwei_macro / 4**s
        nx_level      = nx_macro * 2**s
        sdetwei_level = sdetwei_macro / 2**s

    Returns lists (len multi_levels, index 0 = finest) of scaled arrays.
    """
    out = []
    for ilevel in range(1, multi_levels + 1):
        s = n_split - ilevel + 1
        out.append(
            dict(
                detwei=detwei_macro / (4.0 ** s),
                nx=nx_macro * (2.0 ** s),
                sdetwei=(None if sdetwei_macro is None
                         else sdetwei_macro / (2.0 ** s)),
            )
        )
    return out


def tri_area(x: np.ndarray) -> np.ndarray:
    """Signed area of triangles, x: (..., 2, 3)."""
    x1, y1 = x[..., 0, 0], x[..., 1, 0]
    x2, y2 = x[..., 0, 1], x[..., 1, 1]
    x3, y3 = x[..., 0, 2], x[..., 1, 2]
    return 0.5 * ((x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1))
