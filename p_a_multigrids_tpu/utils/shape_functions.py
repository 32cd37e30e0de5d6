"""Element shape-function tables (host-side constants baked into kernels).

Re-derives the reference's shape-function library as small NumPy tables:
- P1 triangle volume functions (ShapFun.F90:1036-1056 ``SHATRIold``):
  local coordinates are the first two barycentrics, so
  ``N = (L1, L2, L3)`` and ``dN/dlx = [[1,0,-1],[0,1,-1]]``.
- P1 edge (surface) functions on [-1,1] (ShapFun.F90:1102-1116).
- Bilinear quad functions via 1-D Lagrange tensor products
  (ShapFun.F90:72-257 ``RE2DN4``/``LAGROT``).

Face conventions for the triangle (transport_tri_semi.F90:142-147 and the
ASCII art at splitting.F90:663-668):

    local nodes         local faces
        2                  |\\
        |\\              2 | \\ 3
        | \\               |__\\
        |__\\                1
        3   1

    face 1 = edge (node1, node3)
    face 2 = edge (node3, node2)
    face 3 = edge (node2, node1)

``TRI_FACE_NODES[f] = (a, b)`` lists the two volume-local nodes of face f in
the face's intrinsic (first->second surface node) order.
"""

from __future__ import annotations

import numpy as np

from . import quadrature

_F = np.float64

# face f -> (volume node of surface node 1, volume node of surface node 2)
# 0-based: face0=(0,2), face1=(2,1), face2=(1,0)
TRI_FACE_NODES = np.asarray([[0, 2], [2, 1], [1, 0]], np.int32)


def tri_p1(ngi: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """P1 triangle: returns (n, nlx, weight).

    n:   (ngi, 3)      shape functions at quadrature points
    nlx: (ngi, 2, 3)   local derivatives (constant for P1)
    weight: (ngi,)
    """
    L, w = quadrature.triangle_rule(ngi)
    n = L.copy()
    nlx = np.zeros((ngi, 2, 3), _F)
    nlx[:, 0, :] = [1.0, 0.0, -1.0]
    nlx[:, 1, :] = [0.0, 1.0, -1.0]
    return n, nlx, w


def edge_p1(sngi: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """P1 line element on [-1,1]: returns (sn, snlx, sweight).

    sn:   (sngi, 2)    surface shape functions
    snlx: (sngi, 1, 2) derivative wrt the single local coordinate
    sweight: (sngi,)   weights summing to 2
    """
    x, w = quadrature.edge_rule(sngi)
    sn = np.stack([0.5 * (1.0 - x), 0.5 * (1.0 + x)], axis=1)
    snlx = np.zeros((sngi, 1, 2), _F)
    snlx[:, 0, 0] = -0.5
    snlx[:, 0, 1] = 0.5
    return sn, snlx, w


def tri_face_tables(ngi: int = 3, sngi: int = 2):
    """Surface shape-fn tables lifted to volume-node indexing.

    Returns a dict with:
      face_sn:  (nface=3, sngi, nloc=3)  my-side surface fns on volume nodes
      face_sn2: (3, sngi, 3)            neighbor-side fns assuming the shared
                 edge is traversed in opposite order (the conforming case);
                 cross-macro orientations are handled by the halo permutation
                 tables in mesh.splitting instead.
      sweight:  (sngi,)
    Mirrors tri_surface_pointers_sn / unstr_tri_surface_pointers_sn
    (ShapFun.F90:781-895, ShapFun_unstruc.F90:123-190) but with one unified
    face convention (see module docstring).
    """
    sn, _snlx, sw = edge_p1(sngi)
    nface, nloc = 3, 3
    face_sn = np.zeros((nface, sngi, nloc), _F)
    face_sn2 = np.zeros((nface, sngi, nloc), _F)
    for f in range(nface):
        a, b = TRI_FACE_NODES[f]
        face_sn[f, :, a] = sn[:, 0]
        face_sn[f, :, b] = sn[:, 1]
        # neighbor traverses the shared edge in the opposite direction: the
        # neighbor's surface node 1 sits at my surface node 2's position.
        face_sn2[f, :, a] = sn[:, 0]
        face_sn2[f, :, b] = sn[:, 1]
    return {"face_sn": face_sn, "face_sn2": face_sn2, "sweight": sw,
            "sn_orig": sn}


def quad_bilinear(ngi_1d: int = 2):
    """Bilinear quad element via tensor-product Gauss (RE2DN4 equivalent).

    Local node order matches the reference quad: nodes at
    (0,0), (1,0), (0,1), (1,1) in unit-square coordinates.

    Returns (n, nlx, weight, face_tables) where
      n:   (ngi, 4), nlx: (ngi, 2, 4), weight: (ngi,)
      face_tables: dict with face_sn (4, sngi, 4), face_sn2, sweight and
      QUAD_FACE_NODES.
    """
    x, w = quadrature.gauss_01(ngi_1d)
    ngi = ngi_1d * ngi_1d
    # 1-D P1 Lagrange on [0,1]
    def n1(x):
        return np.stack([1.0 - x, x], axis=-1)          # (m, 2)

    def d1(x):
        return np.stack([-np.ones_like(x), np.ones_like(x)], axis=-1)

    gx, gy = np.meshgrid(x, x, indexing="ij")
    gx, gy = gx.ravel(), gy.ravel()
    wx, wy = np.meshgrid(w, w, indexing="ij")
    weight = (wx * wy).ravel()

    nx_ = n1(gx)
    ny_ = n1(gy)
    dx_ = d1(gx)
    dy_ = d1(gy)
    # node (i,j) -> local index: (0,0)->0 (1,0)->1 (0,1)->2 (1,1)->3
    order = [(0, 0), (1, 0), (0, 1), (1, 1)]
    n = np.zeros((ngi, 4), _F)
    nlx = np.zeros((ngi, 2, 4), _F)
    for k, (i, j) in enumerate(order):
        n[:, k] = nx_[:, i] * ny_[:, j]
        nlx[:, 0, k] = dx_[:, i] * ny_[:, j]
        nlx[:, 1, k] = nx_[:, i] * dy_[:, j]

    # faces of the unit square: 0=bottom(y=0), 1=right(x=1), 2=top(y=1),
    # 3=left(x=0); endpoints ordered counter-clockwise.
    QUAD_FACE_NODES = np.asarray([[0, 1], [1, 3], [3, 2], [2, 0]], np.int32)
    sx, sw = quadrature.gauss_01(ngi_1d)
    sn1 = n1(sx)                                        # (sngi, 2)
    sngi = ngi_1d
    face_sn = np.zeros((4, sngi, 4), _F)
    face_sn2 = np.zeros((4, sngi, 4), _F)
    for f in range(4):
        a, b = QUAD_FACE_NODES[f]
        face_sn[f, :, a] = sn1[:, 0]
        face_sn[f, :, b] = sn1[:, 1]
        face_sn2[f, :, a] = sn1[:, 0]
        face_sn2[f, :, b] = sn1[:, 1]
    ft = {"face_sn": face_sn, "face_sn2": face_sn2, "sweight": 2.0 * sw,
          "face_nodes": QUAD_FACE_NODES}
    return n, nlx, weight, ft
