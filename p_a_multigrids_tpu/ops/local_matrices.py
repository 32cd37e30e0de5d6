"""Batched element matrices (mass / advection stiffness / diffusion volume /
face-penalty / upwind flux coefficients).

The reference assembles these one element at a time inside its solver loops
(`get_un_ele_mass_stiff_diffvol` /root/reference/ShapFun_unstruc.F90:304-407,
mass/stiffness loops transport_tri.F90:169-230, penalty
transport_tri_semi.F90:468-477).  Here each is a single NumPy einsum over the
whole element batch, run ONCE at setup (host-side: assembly is not on the
device hot path — the results are baked into the level tables / BSR values),
producing dense (..., nloc, nloc) blocks consumed by models.semi.build_problem
and models.transport_rect.

Shapes use the convention: detwei (..., ngi), nx (..., ngi, ndim, nloc),
n (ngi, nloc) shared tables.
"""

from __future__ import annotations

import numpy as np


def mass(n, detwei):
    """M[i,j] = sum_g n[g,i] n[g,j] detwei[g]  -> (..., nloc, nloc)."""
    return np.einsum("gi,gj,...g->...ij", n, n, detwei)


def lumped_mass(n, detwei):
    """ml[j] = sum_g n[g,j] detwei[g] (row-sum lumping) -> (..., nloc)."""
    return np.einsum("gj,...g->...j", n, detwei)


def advection_stiffness(n, nx, detwei, ugi):
    """K[i,j] = sum_{g,d} nx[g,d,i] u[g,d] n[g,j] detwei[g].

    The weak advection term after integration by parts: A contributes -K
    (transport_tri_semi.F90:596-599 with stiff_stcl from
    ShapFun_unstruc.F90:330).

    ugi: (..., ngi, ndim) velocity at quadrature points.
    """
    return np.einsum("...gdi,...gd,gj,...g->...ij", nx, ugi, n, detwei)


def diffusion_volume(nx, detwei, k):
    """D[i,j] = k * sum_{g,d} nx[g,d,i] nx[g,d,j] detwei[g].

    (ShapFun_unstruc.F90:331 contracted as in transport_tri_semi.F90:602-606.)
    k may be scalar or batched (...,).
    """
    D = np.einsum("...gdi,...gdj,...g->...ij", nx, nx, detwei)
    return D * np.asarray(k)[..., None, None] if np.ndim(k) else k * D


def face_penalty(face_sn, sdetwei, k_over_dx):
    """Interior-penalty surface diffusion coefficient blocks.

    P[f, i, j] = (k/dx_f) * sum_sg face_sn[f,sg,i] face_sn[f,sg,j] sdetwei[f,sg]

    matching get_diff_surf_stencl (transport_tri_semi.F90:468-477); the
    neighbor-side block uses the neighbor's trace values, handled by the
    caller via the permutation gather.

    Args:
      face_sn:   (nface, sngi, nloc)
      sdetwei:   (..., nface, sngi)
      k_over_dx: (..., nface)
    Returns (..., nface, nloc, nloc).
    """
    P = np.einsum("fgi,fgj,...fg->...fij", face_sn, face_sn, sdetwei)
    return P * k_over_dx[..., None, None]


def upwind_face_flux(face_sn, face_sn2, sdetwei, snorm, usgi, usgi2,
                     t_sgi, t2_sgi):
    """Upwind DG advection flux residual contribution per face.

    income = 0.5 + 0.5*sign(-snorm . 0.5*(u + u2))       (upwind switch,
    transport_rect.F90:250-252)
    s_cont_d = snorm_d * sdetwei * ((1-income) u_d t + income u2_d t2)
    flux[i]  = sum_{sg,d} face_sn[sg,i] * s_cont_d       (:259-268)

    Args:
      face_sn: (nface, sngi, nloc); face_sn2 unused here (t2_sgi is already
               the neighbor trace) — kept for signature clarity.
      sdetwei: (..., nface, sngi)
      snorm:   (..., nface, sngi, ndim)
      usgi:    (..., nface, sngi, ndim) my velocity at surface points
      usgi2:   (..., nface, sngi, ndim) neighbor velocity at surface points
      t_sgi:   (..., nface, sngi) my scalar trace
      t2_sgi:  (..., nface, sngi) neighbor scalar trace
    Returns flux (..., nloc) = sum over faces of surface contributions.
    """
    uavg = 0.5 * (usgi + usgi2)
    income = 0.5 + 0.5 * np.sign(-np.sum(snorm * uavg, axis=-1))
    s_cont = snorm * sdetwei[..., None] * (
        ((1.0 - income) * t_sgi)[..., None] * usgi
        + (income * t2_sgi)[..., None] * usgi2)
    return np.einsum("fgi,...fgd->...i", face_sn, s_cont)
