"""Distributed stencil V-cycle — the FAST multi-chip path.

Shards the transposed block-stencil operator (ops/stencil) over a 1-D
device mesh along the macro axis, after RCM-ordering the macro elements so
every element's cross-macro strip sources lie within a band of width W
(measured 63 on untitled8192).  The halo exchange is then exactly two
neighbor ``ppermute``s per operator application: each device sends its
first/last W packed strip rows to its ring neighbors — the TPU-native form
of the reference's ``update_overlaps`` boundary-strip writes
(/root/reference/splitting.F90:1210-1398) — and the exchange is issued
before the interior volume/intra-macro work so XLA overlaps the ICI
transfer with the independent FMAs (double-buffering falls out of the
dependency graph).

Everything else is macro-local: multigrid transfers never communicate, and
the coarsest solve either runs replicated (dense inverse after one
all_gather) or smooths shard-locally.

This replaces the round-1 distributed path (parallel/solver.py, kept as
the bit-exact reference implementation) whose every halo was a blocking
all-to-all ``all_gather`` around the SLOW einsum operator.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SemiConfig, Solver
from ..mesh import splitting, topology
from ..models import semi
from . import partition

_AXIS = "dp"


def _level_tables(op, U_loc: int, dtype):
    """Shardable table dict + window strip indices for one level."""
    data = op._data
    U, C, nb = op.U, op.C, op.nb
    hs = np.asarray(data.halo_src)
    src_u = (hs // C).T                                  # (nb, U)
    # strip packing tables (same construction as StencilOperator)
    uniq_c = np.unique(data.bnd_c)
    nbc = len(uniq_c)
    qpos = np.zeros(C, np.int64)
    qpos[uniq_c] = np.arange(nbc)
    mf_of = splitting.CHILD2MACRO_FACE[data.bnd_f]
    groups = [np.nonzero(mf_of == mf)[0] for mf in range(3)]
    m = nb // 3
    face_src = np.stack([src_u[g[0]] for g in groups])   # (3, U)
    W = int(np.abs(face_src - np.arange(U)[None]).max())
    sel = np.zeros((3, U, m, nbc))
    src_c = (hs % C).T
    for mf, g in enumerate(groups):
        u_idx = np.arange(U)[:, None]
        sel[mf][u_idx, np.arange(m)[None, :], qpos[src_c[g].T]] = 1.0
    order = np.concatenate(groups)
    inv_perm = np.argsort(order).astype(np.int32)

    block_start = (np.arange(U) // U_loc) * U_loc
    win_src = (face_src - block_start[None]).astype(np.int32)  # +W at use

    t = lambda a: np.asarray(a, dtype)
    Dinv = op._dinv_np
    Fp = np.einsum("ucik,ucfkj->ucfij", Dinv, data.face_blocks)
    Xp = (np.einsum("usik,uskj->usij", Dinv[:, data.bnd_c],
                    data.cross_blocks) if nb else data.cross_blocks)
    cn = splitting.child_neighbors(
        int(round(np.log(C) / np.log(4))) if C > 1 else 0)
    intra_rows = np.where(cn >= 0, cn,
                          np.arange(C)[:, None]).T.astype(np.int32)
    tabs = dict(
        S_t=t(data.self_blocks.transpose(2, 3, 1, 0)),       # (3,3,C,U)
        F_t=t(data.face_blocks.transpose(2, 3, 4, 1, 0)),
        X_t=t(data.cross_blocks.transpose(2, 3, 1, 0)),
        Fp_t=t(Fp.transpose(2, 3, 4, 1, 0)),
        Xp_t=t(Xp.transpose(2, 3, 1, 0)),
        Dinv_t=t(Dinv.transpose(2, 3, 1, 0)),
        c_aff_t=t(data.c_aff.transpose(2, 1, 0)),            # (3, C, U)
        intra_oh=t(data.intra_onehot),                       # (3, C, C)
        intra_rows=intra_rows,                               # (3f, C)
        cross_oh=t(data.cross_onehot.sum(axis=0)),           # (C, nb)
        pack_rows=uniq_c.astype(np.int32),                   # (nbc,)
        strip_sel=t(sel),                                    # (3, U, m, nbc)
        inv_perm=inv_perm,                                   # (nb,)
        win_src=win_src,                                     # (3, U)
    )
    specs = dict(
        S_t=P(None, None, None, _AXIS), F_t=P(None, None, None, None, _AXIS),
        X_t=P(None, None, None, _AXIS),
        Fp_t=P(None, None, None, None, _AXIS),
        Xp_t=P(None, None, None, _AXIS), Dinv_t=P(None, None, None, _AXIS),
        c_aff_t=P(None, None, _AXIS), intra_oh=P(), intra_rows=P(),
        cross_oh=P(),
        pack_rows=P(), strip_sel=P(None, _AXIS), inv_perm=P(),
        win_src=P(None, _AXIS),
    )
    meta = dict(C=C, nb=nb, nbc=nbc, m=m, W=W)
    return tabs, specs, meta


def _strip(tab, meta, x_t, W: int, n_dev: int):
    """Window halo exchange + local strip selection -> (3, nb, U_loc).

    Two neighbor ppermutes of the packed strip rows; issued first so XLA
    overlaps the ICI transfer with the interior compute that follows.
    """
    nbc, m = meta["nbc"], meta["m"]
    U_loc = x_t.shape[-1]
    sp = x_t[:, tab["pack_rows"], :]                     # (3, nbc, U_loc)
    rows = sp.reshape(3 * nbc, U_loc).T                  # (U_loc, 3*nbc)
    fwd = [(d, (d + 1) % n_dev) for d in range(n_dev)]
    bwd = [(d, (d - 1) % n_dev) for d in range(n_dev)]
    from_left = jax.lax.ppermute(rows[-W:], _AXIS, fwd)
    from_right = jax.lax.ppermute(rows[:W], _AXIS, bwd)
    rows_ext = jnp.concatenate([from_left, rows, from_right], axis=0)
    g = rows_ext[tab["win_src"] + W]                     # (3, U_loc, 3nbc)
    g = g.reshape(3, U_loc, 3, nbc)
    sv = jnp.einsum("mujq,mukq->jmku", g, tab["strip_sel"])
    sv = sv.reshape(3, 3 * m, U_loc)
    return sv[:, tab["inv_perm"], :]


def _planes(tab, x_t, F_t, X_t, sv):
    C = x_t.shape[1]
    if C > 64:
        # static row gather, O(C) — the (C, C) one-hot einsum is O(C^2)
        # FLOPs and constant-folding pain at deep n_split (same switch as
        # ops.stencil.StencilOperator._apply_planes)
        rows = tab["intra_rows"]                     # (3f, C) int32
        xg = x_t[:, rows.reshape(-1), :].reshape(
            3, 3, C, x_t.shape[-1])                  # (j, f, C, U_loc)
        xg = jnp.swapaxes(xg, 0, 1)                  # (f, j, C, U_loc)
    else:
        xg = jnp.einsum("fcd,jdu->fjcu", tab["intra_oh"], x_t)
    out = []
    for i in range(3):
        acc = None
        for f in range(3):
            for j in range(3):
                term = F_t[f, i, j] * xg[f, j]
                acc = term if acc is None else acc + term
        cs = X_t[i, 0] * sv[0] + X_t[i, 1] * sv[1] + X_t[i, 2] * sv[2]
        out.append(acc + tab["cross_oh"] @ cs)
    return out


def _mul33(B, v_t):
    return jnp.stack([B[i, 0] * v_t[0] + B[i, 1] * v_t[1] + B[i, 2] * v_t[2]
                      for i in range(3)])


def _apply(tab, meta, x_t, with_bc: bool, W, n_dev):
    sv = _strip(tab, meta, x_t, W, n_dev)
    nbr = _planes(tab, x_t, tab["F_t"], tab["X_t"], sv)
    out = _mul33(tab["S_t"], x_t) + jnp.stack(nbr)
    return out + tab["c_aff_t"] if with_bc else out


def _sweep(tab, meta, x_t, bp_t, coefs, W, n_dev):
    for coef in coefs:
        sv = _strip(tab, meta, x_t, W, n_dev)
        off = _planes(tab, x_t, tab["Fp_t"], tab["Xp_t"], sv)
        z = jnp.stack([bp_t[i] - x_t[i] - off[i] for i in range(3)])
        x_t = x_t + coef * z
    return x_t


class DistributedStencilSolver:
    """Sharded counterpart of SemiSolver's transposed stencil V-cycle."""

    def __init__(self, mesh: topology.MacroMesh, cfg: SemiConfig,
                 devices=None):
        if cfg.solver not in (Solver.CHEBYSHEV, Solver.BLOCK_JACOBI):
            raise ValueError("distributed stencil solver needs the "
                             "Chebyshev or block-Jacobi smoother")
        devices = devices if devices is not None else jax.devices()
        D = len(devices)
        self.jmesh = Mesh(np.asarray(devices), axis_names=(_AXIS,))
        self.D = D

        mesh = topology.reorder_elements(mesh, topology.rcm_order(mesh))
        mesh, self.n_active = partition.pad_mesh(mesh, D)
        self.U = mesh.num_elements
        self.U_loc = self.U // D

        # the sharded cycle runs the XLA stencil path (the fused Pallas
        # kernel assumes whole-mesh VMEM residency) and handles its own
        # coarse solve (replicated dense inverse / distributed CG) — no
        # host-side agg hierarchy inside shard_map yet
        cfg = dataclasses.replace(cfg, pallas_phase=False, coarse_agg=False)
        self.cfg = cfg
        self.p = semi.build_problem(mesh, cfg)
        self.serial = semi.SemiSolver(self.p)
        if self.serial._stencil is None:
            raise ValueError("stencil operator disabled for this config")

        dtype = np.dtype(cfg.dtype)
        built = [_level_tables(op, self.U_loc, dtype)
                 for op in self.serial._stencil]
        self.tabs = [b[0] for b in built]
        self.specs = [b[1] for b in built]
        self.meta = [b[2] for b in built]
        self.W = max(b[2]["W"] for b in built)
        if self.W > self.U_loc:
            raise ValueError(
                f"halo window W={self.W} exceeds block size {self.U_loc}; "
                f"use fewer devices or a larger mesh")
        # fine-level mass + source for the RHS
        L0np = self.p.levels[0]["_np"]
        self.tabs[0]["M_t"] = np.asarray(L0np["M"].transpose(1, 2, 0), dtype)
        self.tabs[0]["source_t"] = np.asarray(
            L0np["source"].transpose(2, 1, 0), dtype)
        self.specs[0]["M_t"] = P(None, None, _AXIS)
        self.specs[0]["source_t"] = P(None, None, _AXIS)
        if self.serial._coarse_inv_t is not None:
            self.tabs[-1]["coarse_inv"] = np.asarray(
                self.serial._coarse_inv_t)
            self.specs[-1]["coarse_inv"] = P()

        self._coefs = [self.serial._phase_coefs(li, cfg.n_smooth)
                       for li in range(len(self.tabs))]
        nl = len(self.tabs)
        self._coefs_coarse = self.serial._phase_coefs(
            nl - 1, cfg.coarse_sweeps if nl > 1 else cfg.n_smooth)

        self._put_tables()
        self._step = self._build_step()

    def _put_tables(self):
        # one batched transfer for everything (per-array puts pay a full
        # round trip each on remote TPUs)
        shardings = [
            {k: NamedSharding(self.jmesh, specs[k]) for k in tabs}
            for tabs, specs in zip(self.tabs, self.specs)]
        self.tabs_dev = jax.device_put(self.tabs, shardings)

    # -- numerics (inside shard_map) ----------------------------------------
    def _bp(self, tab, b_t, with_bc):
        b = b_t - tab["c_aff_t"] if with_bc else b_t
        return _mul33(tab["Dinv_t"], b)

    @staticmethod
    def _pdot(a, b):
        """Globally-reduced inner product (the psum dot for shard_map)."""
        return jax.lax.psum(jnp.vdot(a.reshape(-1), b.reshape(-1)), _AXIS)

    def _coarse_cg(self, tab, meta, x_t, b_t):
        """coarse_krylov inside shard_map: block-Jacobi PCG with psum
        dots — the distributed mirror of SemiSolver._coarse_cg_t."""
        from ..ops import krylov
        W, D = self.W, self.D
        x_sol, _, _ = krylov.pcg(
            lambda v: _apply(tab, meta, v, False, W, D), b_t, x_t,
            precond=lambda r: _mul33(tab["Dinv_t"], r), tol=0.0,
            maxiter=self.cfg.coarse_sweeps, dot=self._pdot)
        return x_sol

    def _vcycle(self, tabs, li, x_t, b_t, hom: bool = False):
        cfg = self.cfg
        nl = len(tabs)
        with_bc = li == 0 and not hom
        tab, meta = tabs[li], self.meta[li]
        W, D = self.W, self.D
        bp = self._bp(tab, b_t, with_bc)
        if li == nl - 1:
            if nl > 1 and "coarse_inv" in tab:
                full = jax.lax.all_gather(b_t, _AXIS)    # (D, 3, C, U_loc)
                flat = jnp.transpose(full, (1, 2, 0, 3)).reshape(-1)
                x_full = (tab["coarse_inv"] @ flat).reshape(
                    3, meta["C"], D, self.U_loc)
                return x_full[:, :, jax.lax.axis_index(_AXIS)]
            if cfg.coarse_krylov and nl > 1:
                return self._coarse_cg(tab, meta, x_t, b_t)
            return _sweep(tab, meta, x_t, bp, self._coefs_coarse, W, D)
        coefs = self._coefs[li]
        x_t = _sweep(tab, meta, x_t, bp, coefs, W, D)
        r_t = b_t - _apply(tab, meta, x_t, with_bc, W, D)
        bc_ = semi.restrict_t(r_t, self.p.levels[li + 1]["s"])
        e_t = self._vcycle(tabs, li + 1, jnp.zeros_like(bc_), bc_, hom)
        if cfg.cycle_type == "w" and li < 2:
            e_t = self._vcycle(tabs, li + 1, e_t, bc_, hom)
        x_t = x_t + semi.prolong_t(e_t, self.p.levels[li + 1]["s"])
        return _sweep(tab, meta, x_t, bp, coefs, W, D)

    def _build_step(self):
        cfg = self.cfg
        in_specs = (P(None, None, _AXIS), tuple(self.specs))
        shard_map = jax.shard_map

        def step_local(T_t, tabs):
            tab0, meta0 = tabs[0], self.meta[0]
            b_t = (_mul33(tab0["M_t"], T_t) / cfg.dt
                   + _mul33(tab0["M_t"], tab0["source_t"]))
            if cfg.theta < 1.0:
                # spatial operator via the stencil: L = (A - M/dt) / theta
                Ax = _apply(tab0, meta0, T_t, True, self.W, self.D)
                spat = (Ax - _mul33(tab0["M_t"], T_t) / cfg.dt) / cfg.theta
                b_t = b_t - (1.0 - cfg.theta) * spat

            if cfg.krylov:
                # V-cycle-preconditioned Krylov with psum-reduced dots —
                # the distributed mirror of SemiSolver._solve_system_t
                from ..ops import krylov
                A_lin = lambda x: _apply(tab0, meta0, x, False,
                                         self.W, self.D)
                c = _apply(tab0, meta0, jnp.zeros_like(b_t), True,
                           self.W, self.D)
                precond = lambda r: self._vcycle(
                    tabs, 0, jnp.zeros_like(r), r, hom=True)
                method = (krylov.pcg if not cfg.physics.advection
                          else krylov.bicgstab)
                T_new, _, _ = method(A_lin, b_t - c, T_t, precond=precond,
                                     tol=cfg.krylov_tol,
                                     maxiter=cfg.krylov_maxiter,
                                     dot=self._pdot)
                return T_new

            def cycle(x, _):
                return self._vcycle(tabs, 0, x, b_t), None
            T_t, _ = jax.lax.scan(cycle, T_t, None, length=cfg.n_multigrid)
            return T_t

        fn = shard_map(step_local, mesh=self.jmesh,
                       in_specs=in_specs, out_specs=P(None, None, _AXIS),
                       check_vma=False)
        return jax.jit(fn)

    # -- public API ----------------------------------------------------------
    def initial_condition(self):
        from ..ops import fused
        T = fused.to_t(self.serial.initial_condition())
        sh = NamedSharding(self.jmesh, P(None, None, _AXIS))
        return jax.device_put(T, sh)

    def step(self, T_t):
        return self._step(T_t, tuple(self.tabs_dev))

    def run(self, T_t=None, ntime=None):
        if T_t is None:
            T_t = self.initial_condition()
        for _ in range(ntime or self.cfg.ntime):
            T_t = self.step(T_t)
        return T_t

    def to_std(self, T_t):
        """(3, C, U) -> (U_active, C, 3) numpy, padding removed."""
        return np.asarray(jnp.transpose(T_t, (2, 1, 0)))[: self.n_active]

    # -- checkpoint / resume (io.checkpoint passthrough) ---------------------
    def save_checkpoint(self, path: str, T_t, step: int) -> None:
        """Persist the sharded state in the std (unpadded) layout so the
        checkpoint is interchangeable with the serial solver's."""
        from ..io import checkpoint as ckpt
        ckpt.save(path, self.to_std(T_t), step, self.cfg)

    def load_checkpoint(self, path: str):
        """(T_t sharded, step): resume from a serial- or distributed-
        written checkpoint (state re-padded + re-sharded)."""
        from ..io import checkpoint as ckpt
        T_np, step, _, _ = ckpt.load(path)
        C = 4 ** self.cfg.n_split
        full = np.zeros((self.U, C, T_np.shape[-1]), T_np.dtype)
        full[: self.n_active] = T_np
        T_t = jnp.transpose(jnp.asarray(full), (2, 1, 0))
        sh = NamedSharding(self.jmesh, P(None, None, _AXIS))
        return jax.device_put(T_t, sh), step

    def error(self, T_t):
        ana = np.asarray(self.p.analytical)[: self.n_active]
        return np.abs(self.to_std(T_t) - ana)
