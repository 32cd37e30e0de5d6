"""Experiment: strategies for the cross-macro strip gather on TPU.

Current implementation (StencilOperator.strip) is a minor-axis element
gather of nb*U indices from a (3, C*U) plane — measured ~740us on
untitled8192 (the dominant cost of one operator application).

Alternatives measured here:
  A) current: plane[:, rows] element gather
  B) per-face lane gather: group strip slots by source macro column
     (<=3 groups), gather whole (3C, U) columns by the macro permutation,
     then extract the child row per slot with a one-hot contraction over C
  C) as B but extraction via take_along_axis on the sublane axis
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from p_a_multigrids_tpu.config import SemiConfig
from p_a_multigrids_tpu.mesh import topology
from p_a_multigrids_tpu.models import semi as msemi


def timeit(name, fn, *args, reps=100):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:44s} {dt * 1e6:10.1f} us")
    return out


def main():
    mesh = topology.from_msh("/root/reference/Mesh_files/untitled8192.msh")
    cfg = SemiConfig(n_split=2, multi_levels=2, dt=0.05, ntime=1,
                     n_multigrid=1, dtype="float32",
                     stencil_operator=False, fast_operator=False)
    problem = msemi.build_problem(mesh, cfg)
    L = problem.levels[0]
    U = int(L["M"].shape[0])
    C = int(L["updown"].shape[0])
    hs = np.asarray(L["halo_src"])                        # (U, nb)
    nb = hs.shape[1]
    print(f"U={U} C={C} nb={nb}")

    rng = np.random.default_rng(0)
    x_t = jnp.asarray(rng.normal(size=(3, C, U)), jnp.float32)

    # ---- A: current element gather -----------------------------------
    rows_a = jnp.asarray(((hs % C) * U + hs // C).astype(np.int32))

    @jax.jit
    def strip_a(x_t):
        plane = x_t.reshape(3, C * U)
        rows = rows_a.T.reshape(-1)
        return plane[:, rows].reshape(3, nb, U)

    # ---- B: group by source-macro column ------------------------------
    src_u = hs // C                                       # (U, nb)
    src_c = hs % C
    groups = {}
    for s in range(nb):
        key = src_u[:, s].tobytes()
        groups.setdefault(key, []).append(s)
    print(f"groups: {len(groups)} sizes {[len(v) for v in groups.values()]}")
    g_perm = [jnp.asarray(src_u[:, v[0]].astype(np.int32))
              for v in groups.values()]
    g_slots = [np.asarray(v, np.int64) for v in groups.values()]
    # one-hot (ns, C, U) per group
    g_oh = []
    g_idx = []
    for v in groups.values():
        oh = np.zeros((len(v), C, U), np.float32)
        idx = np.zeros((len(v), U), np.int32)
        for k, s in enumerate(v):
            oh[k, src_c[:, s], np.arange(U)] = 1.0
            idx[k] = src_c[:, s]
        g_oh.append(jnp.asarray(oh))
        g_idx.append(jnp.asarray(idx))
    order = np.concatenate([np.asarray(v) for v in groups.values()])
    inv_order = np.argsort(order)
    inv_order_j = jnp.asarray(inv_order)

    @jax.jit
    def strip_b(x_t):
        outs = []
        for perm, oh in zip(g_perm, g_oh):
            y = x_t[:, :, perm]                           # (3, C, U)
            outs.append(jnp.einsum("scu,jcu->jsu", oh, y))
        return jnp.concatenate(outs, axis=1)[:, inv_order_j]

    @jax.jit
    def strip_c(x_t):
        outs = []
        for perm, idx in zip(g_perm, g_idx):
            y = x_t[:, :, perm]                           # (3, C, U)
            ii = jnp.broadcast_to(idx[None], (3,) + idx.shape)
            outs.append(jnp.take_along_axis(
                y, ii.reshape(3, -1, U)[:, :idx.shape[0]], axis=1))
        return jnp.concatenate(outs, axis=1)[:, inv_order_j]

    ra = timeit("A element gather (current)", strip_a, x_t)
    rb = timeit("B lane gather + onehot extract", strip_b, x_t)
    rc = timeit("C lane gather + take_along_axis", strip_c, x_t)
    print("B matches A:", bool(jnp.allclose(ra, rb)))
    print("C matches A:", bool(jnp.allclose(ra, rc)))

    # pure lane gather cost for reference
    perm0 = g_perm[0]
    timeit("lane gather only (3,C,U)[:, :, perm]",
           jax.jit(lambda x: x[:, :, perm0]), x_t)
    # transpose cost for reference
    timeit("transpose (3,C,U)->(U,C,3)",
           jax.jit(lambda x: jnp.transpose(x, (2, 1, 0))), x_t)


if __name__ == "__main__":
    main()
