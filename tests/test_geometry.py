import jax.numpy as jnp
import numpy as np
import pytest

from p_a_multigrids_tpu.mesh import geometry
from p_a_multigrids_tpu.utils import shape_functions


@pytest.fixture
def tri_tables():
    n, nlx, w = shape_functions.tri_p1(3)
    return jnp.asarray(n), jnp.asarray(nlx), jnp.asarray(w)


def test_tri_det_nlx_reference_triangle(tri_tables):
    n, nlx, w = tri_tables
    # reference triangle: node1=(1,0), node2=(0,1), node3=(0,0)
    x = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    detwei, nx, _ = geometry.tri_det_nlx(x, nlx, w)
    assert np.isclose(np.sum(detwei), 0.5)     # area
    # P1 gradients on the reference triangle: grad N1=(1,0), N2=(0,1),
    # N3=(-1,-1)
    assert np.allclose(nx[0, 0, :, 0], [1.0, 0.0])
    assert np.allclose(nx[0, 0, :, 1], [0.0, 1.0])
    assert np.allclose(nx[0, 0, :, 2], [-1.0, -1.0])


def test_tri_det_nlx_general_triangle(tri_tables):
    n, nlx, w = tri_tables
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(16, 2, 3))
    detwei, nx, _ = geometry.tri_det_nlx(jnp.asarray(pts), nlx, w)
    area = np.abs(geometry.tri_area(pts))
    assert np.allclose(np.sum(detwei, axis=-1), area, rtol=1e-12)
    # gradient of a linear field u(x,y)=3x-2y recovered exactly
    u = 3.0 * pts[:, 0, :] - 2.0 * pts[:, 1, :]         # (B, nloc)
    grad = np.einsum("bgdl,bl->bgd", np.asarray(nx), u)
    assert np.allclose(grad[..., 0], 3.0, atol=1e-9)
    assert np.allclose(grad[..., 1], -2.0, atol=1e-9)


def test_det_snlx_length_and_normal():
    sn, snlx, sw = shape_functions.edge_p1(2)
    # edge from (0,0) to (2,0); element centroid below => outward normal +y
    xsl = jnp.asarray([[[0.0, 2.0], [0.0, 0.0]]])
    approx = jnp.asarray([[0.0, 1.0]])
    sdetwei, snorm = geometry.det_snlx(xsl, jnp.asarray(snlx),
                                       jnp.asarray(sw), approx)
    assert np.isclose(np.sum(sdetwei), 2.0)            # edge length
    assert np.allclose(snorm, [[0.0, 1.0], [0.0, 1.0]])


def test_semi_level_scalings():
    n, nlx, w = shape_functions.tri_p1(3)
    x = jnp.asarray([[[2.0, 0.0, 0.0], [0.0, 2.0, 0.0]]])
    detwei, nx, _ = geometry.tri_det_nlx(x, jnp.asarray(nlx), jnp.asarray(w))
    levels = geometry.semi_level_scalings(detwei, nx, None, n_split=2,
                                          multi_levels=2)
    # finest level children have area/16, gradients x4
    assert np.isclose(np.sum(levels[0]["detwei"]), 2.0 / 16)
    assert np.allclose(levels[0]["nx"], np.asarray(nx) * 4)
    assert np.isclose(np.sum(levels[1]["detwei"]), 2.0 / 4)
