"""Distributed semi-structured multigrid solver (shard_map over macro axis).

Row-partitions the flagship solver of models/semi across a JAX device mesh:
macro elements are split into contiguous BFS blocks (partition.py), every
level's tables are sharded over the macro axis, and the only communication
is the halo all_gather of partition-boundary face strips (halo.py) inside
the operator — the distributed realization of the reference's
``update_overlaps`` seam (SURVEY.md section 2 "Parallelism inventory").

The multigrid transfers are macro-local (they only mix children within a
macro element), so restriction/prolongation need no communication at all;
the coarsest-level direct solve gathers its (small) right-hand side to
every device and applies the replicated dense inverse redundantly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SemiConfig, Solver
from ..mesh.topology import MacroMesh
from ..models import semi
from . import halo, partition

_AXIS = "dp"

# level-dict keys with a leading macro (U) axis -> sharded over the mesh
_U_KEYS = ("M", "ml", "D", "K", "nx1", "sdet", "snorm", "inv_dx", "diff_on",
           "neu_mask", "bc_dense", "neigh_elem", "neigh_perm", "source")
# small shared tables -> replicated
_R_KEYS = ("n", "sn", "face_sn", "updown")


class DistributedSemiSolver:
    """Drop-in distributed counterpart of models.semi.SemiSolver."""

    def __init__(self, mesh: MacroMesh, cfg: SemiConfig,
                 devices=None):
        devices = devices if devices is not None else jax.devices()
        self.jmesh = Mesh(np.asarray(devices), axis_names=(_AXIS,))
        D = len(devices)
        self.part = partition.partition_mesh(mesh, D)
        self.cfg = cfg
        self.p = semi.build_problem(self.part.mesh, cfg)
        # serial solver supplies setup-time spectra / inverses (computed
        # once on the default device, then sharded)
        self._serial = semi.SemiSolver(self.p)

        self.plans = [
            halo.build_halo_plan(np.asarray(L.get("_np", L)["neigh_elem"]),
                                 D)
            for L in self.p.levels]
        self._shard_args, self._repl_args, self._specs = self._pack()
        self._step = self._build_step()

    # -- table packing -----------------------------------------------------
    def _pack(self):
        shard_levels, repl_levels = [], []
        sspec_levels, rspec_levels = [], []
        for L, plan in zip(self.p.levels, self.plans):
            sh = {k: L[k] for k in _U_KEYS if k in L}
            sh["halo_export_idx"] = jnp.asarray(plan.export_idx)
            sh["halo_is_remote"] = jnp.asarray(plan.is_remote)
            sh["halo_local_idx"] = jnp.asarray(plan.local_idx)
            sh["halo_src_dev"] = jnp.asarray(plan.src_dev)
            sh["halo_src_slot"] = jnp.asarray(plan.src_slot)
            rp = {k: L[k] for k in _R_KEYS}
            if self.cfg.solver in (Solver.BLOCK_JACOBI, Solver.CHEBYSHEV):
                li = len(shard_levels)
                if getattr(self._serial, "_block_inv", None) is not None:
                    sh["block_inv"] = self._serial._block_inv[li]
                else:
                    # stencil-operator solver: exact diagonal blocks were
                    # probed at setup; reuse their closed-form inverses
                    sh["block_inv"] = jnp.asarray(
                        self._serial._stencil[li]._dinv_np,
                        jnp.dtype(self.cfg.dtype))
            shard_levels.append(sh)
            repl_levels.append(rp)
            sspec_levels.append({k: P(_AXIS) for k in sh})
            rspec_levels.append({k: P() for k in rp})
        if self._serial._coarse_inv is not None:
            repl_levels[-1]["coarse_inv"] = self._serial._coarse_inv
            rspec_levels[-1]["coarse_inv"] = P()
        return ((shard_levels, ), (repl_levels, ),
                (sspec_levels, rspec_levels))

    def _local_level(self, sh: dict, rp: dict, li: int) -> dict:
        """Reassemble a level dict inside shard_map (halo-gather aware)."""
        L = dict(rp)
        for k, v in sh.items():
            if k.startswith("halo_"):
                continue
            L[k] = v
        # plan tables for this device: shard_map hands us the (1, ...)
        # block of the device-stacked arrays
        plan = {
            "export_idx": sh["halo_export_idx"][0],
            "is_remote": sh["halo_is_remote"][0],
            "local_idx": sh["halo_local_idx"][0],
            "src_dev": sh["halo_src_dev"][0],
            "src_slot": sh["halo_src_slot"][0],
        }
        L["C"] = self.p.levels[li]["C"]
        L["s"] = self.p.levels[li]["s"]
        L["gather"] = halo.make_gather(plan, _AXIS)
        return L

    # -- distributed numerics ---------------------------------------------
    def _smooth(self, L, li, x, b, sweeps, with_bc):
        from ..ops import smoothers
        cfg = self.cfg
        phys = cfg.physics
        g = L["gather"]
        A = lambda t: semi.apply_A(L, phys, cfg.dt, cfg.theta, t, with_bc, g)
        if cfg.solver == Solver.CHEBYSHEV:
            Ainv = L["block_inv"]
            solve = lambda r: jnp.einsum("ucij,ucj->uci", Ainv, r)
            return smoothers.chebyshev(A, b, x, solve,
                                       self._serial._cheb_roots(li),
                                       max(1, sweeps // cfg.cheb_degree))
        if cfg.solver == Solver.BLOCK_JACOBI:
            return smoothers.block_jacobi_inv(A, b, x, L["block_inv"],
                                              cfg.omega, sweeps)
        d = semi.diag_A(L, phys, cfg.dt, cfg.theta)
        return smoothers.jacobi(A, b, x, d, cfg.omega, sweeps)

    def _vcycle(self, Ls, li, x, b):
        cfg = self.cfg
        nl = len(self.p.levels)
        with_bc = li == 0
        L = Ls[li]
        if li == nl - 1:
            if nl > 1 and "coarse_inv" in L:
                shape = x.shape
                # gather the coarse RHS from every shard, solve redundantly
                b_full = jax.lax.all_gather(b, _AXIS)    # (D, U_loc, Cc, 3)
                flat = b_full.reshape(-1)
                x_full = (L["coarse_inv"] @ flat).reshape(b_full.shape)
                return x_full[jax.lax.axis_index(_AXIS)]
            return self._smooth(L, li, x, b,
                                cfg.coarse_sweeps if nl > 1 else cfg.n_smooth,
                                with_bc)
        x = self._smooth(L, li, x, b, cfg.n_smooth, with_bc)
        r = b - semi.apply_A(L, cfg.physics, cfg.dt, cfg.theta, x, with_bc,
                             L["gather"])
        bc_ = semi.restrict(r, self.p.levels[li + 1]["s"])
        e = jnp.zeros_like(bc_)
        e = self._vcycle(Ls, li + 1, e, bc_)
        x = x + semi.prolong(e, self.p.levels[li + 1]["s"])
        x = self._smooth(L, li, x, b, cfg.n_smooth, with_bc)
        return x

    def _build_step(self):
        cfg = self.cfg
        sspecs, rspecs = self._specs

        def step_local(T, shard_levels, repl_levels):
            Ls = [self._local_level(sh, rp, li)
                  for li, (sh, rp) in enumerate(zip(shard_levels,
                                                    repl_levels))]
            L0 = Ls[0]
            told = T
            Ms = jnp.einsum("uij,ucj->uci", L0["M"], L0["source"])
            b = jnp.einsum("uij,ucj->uci", L0["M"], told) / cfg.dt + Ms
            if cfg.theta < 1.0:
                b = b - (1.0 - cfg.theta) * semi.apply_spatial(
                    L0, cfg.physics, told, True, L0["gather"])

            def cycle(T, _):
                return self._vcycle(Ls, 0, T, b), None

            T, _ = jax.lax.scan(cycle, T, None, length=cfg.n_multigrid)
            return T

        shard_map = jax.shard_map
        fn = shard_map(
            step_local, mesh=self.jmesh,
            in_specs=(P(_AXIS), sspecs, rspecs),
            out_specs=P(_AXIS), check_vma=False)
        return jax.jit(functools.partial(fn))

    # -- public API --------------------------------------------------------
    def initial_condition(self):
        T = np.asarray(self._serial.initial_condition())
        sh = NamedSharding(self.jmesh, P(_AXIS))
        return jax.device_put(jnp.asarray(T), sh)

    def step(self, T):
        return self._step(T, *self._shard_args, *self._repl_args)

    def run(self, T=None, ntime=None):
        if T is None:
            T = self.initial_condition()
        for _ in range(ntime or self.cfg.ntime):
            T = self.step(T)
        return T

    def active(self, T):
        """Slice away the padding elements (host-side)."""
        return np.asarray(T)[: self.part.n_active]

    def error(self, T):
        return np.abs(self.active(T)
                      - np.asarray(self.p.analytical)[: self.part.n_active])
