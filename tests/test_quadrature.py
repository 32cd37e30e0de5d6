import numpy as np
import pytest

from p_a_multigrids_tpu.utils import quadrature, shape_functions


@pytest.mark.parametrize("ngi", [1, 3, 4, 7, 14])
def test_triangle_rule_weights_sum_to_one(ngi):
    L, w = quadrature.triangle_rule(ngi)
    assert np.isclose(w.sum(), 1.0)
    assert np.allclose(L.sum(axis=1), 1.0)
    assert L.shape == (ngi, 3)


@pytest.mark.parametrize("ngi,deg", [(1, 1), (3, 2), (4, 3), (7, 5), (14, 5)])
def test_triangle_rule_polynomial_exactness(ngi, deg):
    """Integrate x^a y^b over the unit reference triangle exactly.

    With barycentrics (L1, L2) as local coords, integral of L1^a L2^b over
    the reference triangle is a! b! / (a+b+2)!.
    """
    import math

    L, w = quadrature.triangle_rule(ngi)
    for a in range(deg + 1):
        for b in range(deg + 1 - a):
            approx = 0.5 * np.sum(w * L[:, 0] ** a * L[:, 1] ** b)
            exact = (math.factorial(a) * math.factorial(b)
                     / math.factorial(a + b + 2))
            assert np.isclose(approx, exact, atol=1e-12), (ngi, a, b)


@pytest.mark.parametrize("ngi", [1, 4, 5, 11])
def test_tet_rule(ngi):
    L, w = quadrature.tet_rule(ngi)
    assert np.isclose(w.sum(), 1.0 / 6.0)
    assert np.allclose(L.sum(axis=1), 1.0)


def test_tet_rule_11_degree4():
    """The 11-point rule integrates all quartic monomials exactly
    (degree-of-precision 4, ShapFun.F90:441)."""
    import math
    L, w = quadrature.tet_rule(11)
    for a in range(5):
        for b in range(5 - a):
            for c in range(5 - a - b):
                approx = 6.0 * np.sum(
                    w * L[:, 0] ** a * L[:, 1] ** b * L[:, 2] ** c)
                exact = 6.0 * (
                    math.factorial(a) * math.factorial(b)
                    * math.factorial(c)
                    / math.factorial(a + b + c + 3))
                assert np.isclose(approx, exact, atol=1e-9), (a, b, c)


@pytest.mark.parametrize("sngi", [1, 2, 3])
def test_edge_rule(sngi):
    x, w = quadrature.edge_rule(sngi)
    assert np.isclose(w.sum(), 2.0)
    # degree 2*sngi-1 exactness
    for p in range(2 * sngi):
        assert np.isclose(np.sum(w * x ** p),
                          (1 - (-1) ** (p + 1)) / (p + 1))


def test_tri_p1_partition_of_unity():
    n, nlx, w = shape_functions.tri_p1(3)
    assert np.allclose(n.sum(axis=1), 1.0)
    assert np.allclose(nlx.sum(axis=2), 0.0)
    # reference derivative table (ShapFun.F90:1042-1048)
    assert np.allclose(nlx[0, 0], [1.0, 0.0, -1.0])
    assert np.allclose(nlx[0, 1], [0.0, 1.0, -1.0])


def test_edge_p1_matches_reference_rule():
    # ShapFun.F90:1102-1116: 2-pt rule at +-1/sqrt(3), weights 1
    sn, snlx, sw = shape_functions.edge_p1(2)
    assert np.allclose(sw, [1.0, 1.0])
    x = -1.0 / np.sqrt(3.0)
    assert np.isclose(sn[0, 0], 0.5 * (1 - x))
    assert np.isclose(sn[0, 1], 0.5 * (1 + x))
    assert np.allclose(sn.sum(axis=1), 1.0)


def test_quad_bilinear():
    n, nlx, w, ft = shape_functions.quad_bilinear(2)
    assert np.allclose(n.sum(axis=1), 1.0)
    assert np.isclose(w.sum(), 1.0)
    assert np.allclose(nlx.sum(axis=2), 0.0)
