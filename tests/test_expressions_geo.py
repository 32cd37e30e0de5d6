"""Expression evaluator (evaluate.F90 counterpart) and .geo reader
(Geo2poly.F90 counterpart) tests."""

import numpy as np
import pytest

from p_a_multigrids_tpu.utils.expressions import (
    Expression, ExpressionError, evaluate)


class TestExpressions:
    def test_arithmetic_precedence(self):
        assert evaluate("2 + 3 * 4") == 14.0
        assert evaluate("(2 + 3) * 4") == 20.0
        assert evaluate("2 ^ 3 ^ 2") == 512.0      # right-assoc
        assert evaluate("2 ** 3") == 8.0
        assert evaluate("-2^2") == -4.0
        assert evaluate("7 / 2 / 2") == 1.75       # left-assoc

    def test_functions_and_constants(self):
        assert np.isclose(evaluate("sin(pi/2)"), 1.0)
        assert np.isclose(evaluate("exp(1)"), np.e)
        assert np.isclose(evaluate("atan2(1, 1)"), np.pi / 4)
        assert np.isclose(evaluate("max(2, 3) + min(2, 3)"), 5.0)
        assert np.isclose(evaluate("erfc(0)"), 1.0)

    def test_variables_vectorized(self):
        f = Expression("sin(x + y)", variables=("x", "y"))
        x = np.linspace(0, 1, 7).reshape(7, 1)
        y = np.linspace(0, 2, 5).reshape(1, 5)
        np.testing.assert_allclose(f(x, y), np.sin(x + y))

    def test_parameters(self):
        """defparam-style symbol table (evaluate.F90 defparam/getparam)."""
        f = Expression("k * x", variables=("x",), parameters={"k": 2.5})
        assert f(4.0) == 10.0

    def test_manufactured_solution_string(self):
        """The reference's boundary(x,y)=sin(x+y) as a config string."""
        f = Expression("sin(x + y)")
        g = Expression("2 * 1.0 * sin(x + y)")  # source for k=1
        x = np.random.default_rng(0).uniform(size=(4, 4))
        np.testing.assert_allclose(f(x, x), np.sin(2 * x))
        np.testing.assert_allclose(g(x, x), 2 * np.sin(2 * x))

    def test_errors(self):
        with pytest.raises(ExpressionError):
            Expression("import os")
        with pytest.raises(ExpressionError):
            Expression("x.__class__")
        with pytest.raises(ExpressionError):
            Expression("unknown_fn(x)")
        with pytest.raises(ExpressionError):
            Expression("x + ")
        with pytest.raises(ExpressionError):
            Expression("x + z")     # z not a declared variable

    def test_no_builtins_reachable(self):
        with pytest.raises(ExpressionError):
            Expression("eval(x)")
        with pytest.raises(ExpressionError):
            Expression("__import__(x)")


SQUARE_GEO = """
lc = 0.25;
Point(1) = {0, 0, 0, lc};
Point(2) = {1, 0, 0, lc};
Point(3) = {1, 1, 0, lc};
Point(4) = {0, 1, 0, lc};
Line(1) = {1, 2};
Line(2) = {2, 3};
Line(3) = {3, 4};
Line(4) = {4, 1};
Line Loop(5) = {1, 2, 3, 4};
Plane Surface(6) = {5};
Physical Surface(100) = {6};
"""

ANNULUS_GEO = """
lc = 0.3;
Point(1) = {0, 0, 0, lc};
Point(2) = {1, 0, 0, lc};
Point(3) = {-1, 0, 0, lc};
Point(4) = {0.4, 0, 0, lc};
Point(5) = {-0.4, 0, 0, lc};
Circle(1) = {2, 1, 3};
Circle(2) = {3, 1, 2};
Circle(3) = {4, 1, 5};
Circle(4) = {5, 1, 4};
Line Loop(10) = {1, 2};
Line Loop(11) = {3, 4};
Plane Surface(20) = {10, 11};
"""


class TestGeo:
    def test_parse_square(self):
        from p_a_multigrids_tpu.mesh import geo
        g = geo.read_geo(SQUARE_GEO)
        assert g.params["lc"] == 0.25
        assert len(g.points) == 4
        assert g.loops[5] == [1, 2, 3, 4]
        assert g.surfaces[6] == [5]
        poly = g.loop_polygon(5)
        assert poly.shape == (4, 2)
        np.testing.assert_allclose(poly[2], [1.0, 1.0])

    def test_mesh_square(self):
        from p_a_multigrids_tpu.mesh import geo
        mesh = geo.mesh_geo(SQUARE_GEO)
        assert mesh.num_elements > 10
        # total area equals the unit square
        from p_a_multigrids_tpu.mesh import geometry
        area = np.abs(geometry.tri_area(mesh.X)).sum()
        np.testing.assert_allclose(area, 1.0, rtol=1e-9)
        # physical surface id propagated
        assert (mesh.region_id == 100).all()
        # every interior edge has a consistent two-sided neighbor map
        interior = mesh.neig >= 0
        e, f = np.nonzero(interior)
        back = mesh.neig[mesh.neig[e, f], mesh.neigh_face[e, f]]
        np.testing.assert_array_equal(back, e)

    def test_mesh_annulus_has_hole(self):
        from p_a_multigrids_tpu.mesh import geo, geometry
        mesh = geo.mesh_geo(ANNULUS_GEO, h=0.25)
        area = np.abs(geometry.tri_area(mesh.X)).sum()
        exact = np.pi * (1.0 - 0.4 ** 2)
        # sampled circles underestimate area slightly
        assert abs(area - exact) / exact < 0.05
        # no triangle centroid inside the hole
        cent = mesh.X.mean(axis=2)
        assert (np.linalg.norm(cent, axis=1) > 0.35).all()

    def test_meshed_geo_solves(self):
        """A .geo-meshed domain runs through the flagship solver."""
        from p_a_multigrids_tpu.config import SemiConfig
        from p_a_multigrids_tpu.mesh import geo
        from p_a_multigrids_tpu.models import semi

        mesh = geo.mesh_geo(SQUARE_GEO, h=0.5)
        cfg = SemiConfig(n_split=1, multi_levels=1, dt=1e6, ntime=1,
                         n_multigrid=30, krylov=True, dtype="float64")
        solver, T = semi.solve(mesh, cfg)
        err = np.asarray(solver.error(T))
        assert err.mean() < 0.01
