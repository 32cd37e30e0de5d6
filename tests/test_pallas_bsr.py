"""Pallas BSR SpMV kernel (ops/pallas_bsr) vs the XLA gather SpMV.

The kernel is the TPU-native csr_mul_array
(/root/reference/matrices.F90:172-193); interpret mode runs it on CPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from p_a_multigrids_tpu.config import SemiConfig
from p_a_multigrids_tpu.mesh import topology
from p_a_multigrids_tpu.models import semi, semi_assembled
from p_a_multigrids_tpu.ops import bsr
from p_a_multigrids_tpu.ops.pallas_bsr import PallasSpMV, spmv_fast


def _operator(mesh_path, n_split):
    mesh = topology.rcm_reorder(topology.from_msh(mesh_path))
    cfg = SemiConfig(n_split=n_split, multi_levels=1, dt=0.05, ntime=1,
                     dtype="float32")
    problem = semi.build_problem(mesh, cfg)
    return semi_assembled.assemble_operator(
        problem.levels[0], cfg.physics, cfg.dt, cfg.theta)


@pytest.mark.parametrize("mesh_name,n_split", [
    ("test_sn2.msh", 2),
    ("900_ele.msh", 1),
])
def test_pallas_spmv_matches_xla(ref_meshdir, mesh_name, n_split):
    A = _operator(f"{ref_meshdir}/{mesh_name}", n_split)
    E = A.num_rows
    x = jnp.asarray(np.random.default_rng(0).normal(size=(E, 3))
                    .astype(np.float32))
    y_ref = np.asarray(A.spmv(x), np.float64)
    C = 4 ** n_split
    for group in (1, C):
        kern = PallasSpMV(A, interpret=True, group=group)
        y = np.asarray(kern(x), np.float64)
        # one-hot matmul gathers are exact; only the sum order differs
        np.testing.assert_allclose(y, y_ref, rtol=0, atol=1e-5 * np.abs(
            y_ref).max())


def test_pallas_spmv_random_banded():
    """Synthetic banded BSR with padded (boundary) slots."""
    rng = np.random.default_rng(1)
    E, K, b, band = 512, 4, 3, 17
    cols = (np.arange(E)[:, None]
            + rng.integers(-band, band + 1, size=(E, K))).clip(0, E - 1)
    cols[:, 0] = np.arange(E)                    # self block in slot 0
    vals = rng.normal(size=(E, K, b, b)).astype(np.float32)
    A = bsr.BSR(cols=jnp.asarray(cols.astype(np.int32)),
                vals=jnp.asarray(vals))
    x = jnp.asarray(rng.normal(size=(E, b)).astype(np.float32))
    kern = PallasSpMV(A, interpret=True)
    np.testing.assert_allclose(np.asarray(kern(x)), np.asarray(A.spmv(x)),
                               rtol=0, atol=1e-4)


def test_spmv_fast_falls_back_on_unbanded():
    """A large pattern with random (unbandable) columns blows the VMEM
    budget -> ValueError -> XLA fallback.  Small or locally-banded
    matrices are always coverable (the band clamps to the VMEM-resident
    x), so this needs per-tile spans of the whole matrix."""
    rng = np.random.default_rng(3)
    E, K, b = 65536, 2, 3
    cols = np.zeros((E, K), np.int32)
    cols[:, 0] = np.arange(E)
    cols[:, 1] = rng.integers(0, E, E)
    vals = np.ones((E, K, b, b), np.float32)
    A = bsr.BSR(cols=jnp.asarray(cols), vals=jnp.asarray(vals))
    fn = spmv_fast(A, interpret=True)
    assert fn == A.spmv
