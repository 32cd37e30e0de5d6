"""Pallas TPU mega-kernel: one kernel per smoothing phase.

Why: on this class of hardware every XLA fusion launch costs a fixed
overhead (measured 60-250 us through the remote-TPU runtime), and a V-cycle
built from per-root XLA fusions issues ~30+ sequential kernels — the launch
floor alone exceeds the arithmetic.  This module fuses an ENTIRE relaxation
phase (all Chebyshev roots / Jacobi sweeps, their strip exchanges, and the
final residual) into ONE `pl.pallas_call`:

  grid = (R + 2 rounds, U/TU tiles), executed sequentially on the core
    round 0        : load x0 and the premultiplied RHS into VMEM scratch
    rounds 1..R    : x <- x + coef_r * (bp - x - offdiag_premult(x))
    round R+1      : coef = 0 (x unchanged), emitting z = D^-1 (b - A x)

  state ping-pongs between two VMEM-resident buffers (the whole DG state is
  (3, C, U) ~ 1.5 MB), so only the coefficient planes stream from HBM —
  the phase runs at coefficient-bandwidth speed with ONE launch.

The cross-macro strip exchange — the gather that dominated rounds 1-2 —
is done in-kernel with zero HBM traffic: macro elements are RCM-ordered
(mesh.topology.rcm_order) so each tile's strip sources live in a narrow
band [off_t, off_t + W) of the macro axis; the kernel slices that band from
the VMEM-resident state and contracts it against an iota-generated one-hot
mask on the MXU (``Precision.HIGHEST`` keeps one-hot matmul gathers exact:
each output sums exactly one f32 product).

Replaces the reference's per-sweep halo exchange + per-element smoother
loops (/root/reference/transport_tri_semi.F90:543-722, splitting.F90:
1210-1398) with a single fused device kernel.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import StencilData, StencilOperator, inv3x3
from ..mesh import splitting

_HIGHEST = jax.lax.Precision.HIGHEST


def _exact_dot(a, b):
    """MXU matmul that is EXACT for one-hot operands (f32 passthrough)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=_HIGHEST,
                               preferred_element_type=a.dtype)


class PhaseOperator:
    """Fused relaxation-phase kernels for one level's stencil operator."""

    # band alignment for the in-kernel dynamic slice (lane-dim offsets)
    ALIGN = 256

    VMEM_BUDGET = 48 * 1024 * 1024

    @classmethod
    def _vmem(cls, C: int, U: int, tu: int, itemsize: int) -> int:
        """Ping-pong state + RHS scratch + double-buffered coefficient
        tiles (measured OK at ~19 MB on v5e)."""
        return (3 * 3 * C * U + 2 * (81 + 9) * C * tu) * itemsize

    @classmethod
    def _pick_tu(cls, U: int, C: int, itemsize: int) -> int:
        """Macro-axis (lane) tile width.  Mosaic requires lane-dim blocks
        to be multiples of 128 or the whole axis, so candidates are 128,
        its multiples dividing U, and U itself (tiny meshes run as a
        single tile); among those, the first whose coefficient tiles fit
        the VMEM budget — large C (deep n_split) shrinks the tile because
        the (81+9)*C*TU coefficient planes dominate."""
        cands = [tu for tu in (128, 256, 384, 512) if U % tu == 0]
        cands += [U] if U not in cands else []
        cands.sort(key=lambda tu: (tu != 128, tu))
        for tu in cands:
            if cls._vmem(C, U, tu, itemsize) <= cls.VMEM_BUDGET:
                return tu
        raise ValueError(
            f"phase kernel needs ~{cls._vmem(C, U, cands[0], itemsize) >> 20}"
            f" MB VMEM (C={C}, U={U}) — falling back to the XLA stencil "
            f"path")

    def __init__(self, op: StencilOperator, interpret: bool = False):
        self.op = op
        self.interpret = interpret
        data = op._data
        U, C, nb = op.U, op.C, op.nb
        self.U, self.C, self.nb = U, C, nb
        dtype = np.dtype(op.S_t.dtype)    # no device readback
        self.dtype = dtype
        self.TU = self._pick_tu(U, C, dtype.itemsize)
        self.T = U // self.TU

        # slot regrouping: canonical slot order -> (macro face, position)
        mf_of = splitting.CHILD2MACRO_FACE[data.bnd_f]       # (nb,)
        groups = [np.nonzero(mf_of == mf)[0] for mf in range(3)]
        m = nb // 3
        assert all(len(g) == m for g in groups)
        self.m = m
        order = np.concatenate(groups)                       # kernel order

        hs = np.asarray(data.halo_src)                       # (U, nb)
        src_c = (hs % C)[:, order].T.reshape(3, m, U)        # (3, m, U)
        src_u = (hs // C)[:, order].T.reshape(3, m, U)
        # all slots of one macro face source the same neighbor macro
        assert (src_u == src_u[:, :1]).all()
        src_u = src_u[:, 0]                                  # (3, U)

        # per-tile band: [off_t, off_t + W) must cover every source macro
        lo = src_u.reshape(3, self.T, self.TU).min(axis=(0, 2))
        hi = src_u.reshape(3, self.T, self.TU).max(axis=(0, 2))
        offs = (lo // self.ALIGN) * self.ALIGN
        span = int((hi - offs).max()) + 1
        W = -(-span // 128) * 128
        W = min(W, U)
        offs = np.minimum(offs, U - W)
        if (hi - offs).max() >= W:
            raise ValueError(
                f"strip band W={W} cannot cover sources; RCM-order the "
                f"macro mesh (mesh.topology.rcm_order) first")
        self.W = W
        self.offs = offs.astype(np.int32)                    # (T,)
        self.src_rel = (src_u
                        - offs[(np.arange(U) // self.TU)][None]).astype(
                            np.int32)                        # (3, U)
        self.src_c = src_c.astype(np.int32)

        # premultiplied blocks: reuse the StencilOperator's device arrays
        # (identical layouts) — only the slot-REGROUPED cross tables and the
        # band indices are new uploads
        self.Fp_t = op.Fp_t                                  # (3,3,3,C,U)
        self.S_t = op.S_t                                    # (3,3,C,U)
        self.intra_oh = op.intra_oh                          # (3, C, C)
        Dinv = op._dinv_np
        Xp = (np.einsum("usik,uskj->usij", Dinv[:, data.bnd_c],
                        data.cross_blocks) if nb else data.cross_blocks)
        host = dict(
            Xp_g=np.asarray(Xp[:, order].transpose(2, 3, 1, 0), dtype),
            cross_oh=np.asarray(
                data.cross_onehot.sum(axis=0)[:, order], dtype),  # (C, nb)
            src_rel=self.src_rel,
            src_c=self.src_c,
        )
        for key, val in jax.device_put(host).items():
            setattr(self, key, val)
        self._calls: dict = {}

    # -- kernel --------------------------------------------------------------
    def _kernel(self, offs_ref, coefs_ref, x0_ref, bp_ref, Fp_ref, Xp_ref,
                srel_ref, sc_ref, ioh_ref, coh_ref,
                xout_ref, zout_ref, xab, bps):
        C, TU, W, m, nb = self.C, self.TU, self.W, self.m, self.nb
        r = pl.program_id(0)
        t = pl.program_id(1)
        ts = pl.multiple_of(t * TU, TU)

        @pl.when(r == 0)
        def _load():
            xab[0, :, :, pl.ds(ts, TU)] = x0_ref[:]
            bps[:, :, pl.ds(ts, TU)] = bp_ref[:]
            xout_ref[:] = x0_ref[:]
            zout_ref[:] = jnp.zeros(zout_ref.shape, zout_ref.dtype)

        @pl.when(r > 0)
        def _sweep():
            pread = (r + 1) % 2          # round 1 reads buffer 0
            pwrite = r % 2
            off_t = pl.multiple_of(offs_ref[t], self.ALIGN)
            xv = xab[pread, :, :, pl.ds(ts, TU)]             # (3, C, TU)
            band = xab[pread, :, :, pl.ds(off_t, W)]         # (3, C, W)
            ioh = ioh_ref[:]
            Fp = Fp_ref[:]

            # intra-macro neighbor planes: exact one-hot matmuls
            xg = [[_exact_dot(ioh[f], xv[j]) for j in range(3)]
                  for f in range(3)]

            # cross-macro strips: banded one-hot matmul over the macro axis,
            # then per-slot child selection — all data VMEM-resident
            sv = None
            if nb:
                srel = srel_ref[:]                           # (3, TU)
                sc = sc_ref[:]                               # (3, m, TU)
                band2 = band.reshape(3 * C, W)
                iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, TU), 0)
                iota_c = jax.lax.broadcasted_iota(
                    jnp.int32, (m, C, TU), 1)
                sv = []                                      # [j] -> (nb, TU)
                parts = [[] for _ in range(3)]
                for mf in range(3):
                    mask = (iota_w == srel[mf][None, :]).astype(band2.dtype)
                    full = _exact_dot(band2, mask).reshape(3, C, TU)
                    sel = (iota_c == sc[mf][:, None, :]).astype(band2.dtype)
                    for j in range(3):
                        # (m, C, TU) -> (m, TU): pick source child per slot
                        parts[j].append((full[j][None] * sel).sum(axis=1))
                sv = [jnp.concatenate(parts[j], axis=0)      # (nb, TU)
                      for j in range(3)]

            bpv = bps[:, :, pl.ds(ts, TU)]
            coef = coefs_ref[r]
            outs = []
            zs = []
            for i in range(3):
                acc = None
                for f in range(3):
                    for j in range(3):
                        term = Fp[f, i, j] * xg[f][j]
                        acc = term if acc is None else acc + term
                if nb:
                    Xp = Xp_ref[:]
                    coh = coh_ref[:]
                    cs = Xp[i, 0] * sv[0]
                    for j in range(1, 3):
                        cs = cs + Xp[i, j] * sv[j]           # (nb, TU)
                    acc = acc + _exact_dot(coh, cs)
                z = bpv[i] - xv[i] - acc
                zs.append(z)
                outs.append(xv[i] + coef * z)
            xnew = jnp.stack(outs)
            xab[pwrite, :, :, pl.ds(ts, TU)] = xnew
            xout_ref[:] = xnew
            zout_ref[:] = jnp.stack(zs)

    # -- invocation ----------------------------------------------------------
    def _call(self, n_rounds: int):
        """Build (and cache) the pallas_call for a phase of n_rounds-2
        relaxation rounds (+ load round + coef-0 residual round)."""
        if n_rounds in self._calls:
            return self._calls[n_rounds]
        C, TU, U, nb, m, W = (self.C, self.TU, self.U, self.nb, self.m,
                              self.W)
        T = self.T
        dt = jnp.dtype(self.dtype)

        def im(*block):
            return lambda r, t, offs, coefs: block

        def im_t(*lead):
            return lambda r, t, offs, coefs: lead + (t,)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_rounds, T),
            in_specs=[
                pl.BlockSpec((3, C, TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),        # x0
                pl.BlockSpec((3, C, TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),        # bp
                pl.BlockSpec((3, 3, 3, C, TU), im_t(0, 0, 0, 0),
                             memory_space=pltpu.VMEM),        # Fp
                pl.BlockSpec((3, 3, max(nb, 1), TU), im_t(0, 0, 0),
                             memory_space=pltpu.VMEM),        # Xp
                pl.BlockSpec((3, TU), im_t(0,),
                             memory_space=pltpu.VMEM),        # src_rel
                pl.BlockSpec((3, max(m, 1), TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),        # src_c
                pl.BlockSpec((3, C, C), im(0, 0, 0),
                             memory_space=pltpu.VMEM),        # intra_oh
                pl.BlockSpec((C, max(nb, 1)), im(0, 0),
                             memory_space=pltpu.VMEM),        # cross_oh
            ],
            out_specs=[
                pl.BlockSpec((3, C, TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, C, TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 3, C, U), dt),
                pltpu.VMEM((3, C, U), dt),
            ],
        )
        call = pl.pallas_call(
            self._kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((3, C, U), dt),
                       jax.ShapeDtypeStruct((3, C, U), dt)],
            interpret=self.interpret,
        )
        self._calls[n_rounds] = call
        return call

    def phase(self, x_t, bp_t, coefs):
        """Run one relaxation phase: len(coefs) rounds over the whole mesh.

        Args:
          x_t:   (3, C, U) state in transposed layout
          bp_t:  (3, C, U) premultiplied RHS D^-1 (b - c_aff)
          coefs: python list of per-round step sizes (1/root_k or omega)
        Returns:
          (x_new, z) with z = D^-1 (b - A x_new) — multiply by the self
          blocks (StencilOperator.mul_self) to get the true residual.
        """
        n_rounds = len(coefs) + 2
        coefs_arr = jnp.asarray(
            np.concatenate([[0.0], np.asarray(coefs, np.float64), [0.0]])
            .astype(self.dtype))
        call = self._call(n_rounds)
        x_new, z = call(jnp.asarray(self.offs), coefs_arr, x_t, bp_t,
                        self.Fp_t, self.Xp_g, self.src_rel, self.src_c,
                        self.intra_oh, self.cross_oh)
        return x_new, z

    def mul_self(self, z_t):
        """r = D z (self blocks) — turns the kernel's z into b - A x."""
        S = self.S_t
        return jnp.stack([
            S[i, 0] * z_t[0] + S[i, 1] * z_t[1] + S[i, 2] * z_t[2]
            for i in range(3)])


class PhaseOperatorResident(PhaseOperator):
    """Phase kernel with class-compressed, VMEM-resident coefficients.

    The semi-structured geometry makes the premultiplied face blocks
    massively redundant: congruent children of a macro element share
    identical blocks (the reference's own scaling argument,
    /root/reference/ShapFun.F90:1654-1682 — detwei/4^l against nx*2^l
    cancels), so per macro there are only a handful of distinct
    (up/down x boundary-configuration) block classes.  The V1 kernel
    streams the full (3,3,3,C,U) coefficient tensor from HBM every round —
    the dominant traffic of the V-cycle — and cannot even fit its tiles in
    VMEM at deep n_split.  Here the coefficients are stored once per CLASS
    (3,3,3,ncls,U), both the class table and a (ncls,C,U) expansion
    one-hot stay VMEM-RESIDENT across all rounds and tiles (constant index
    maps), and each sweep expands them on the fly with VPU
    multiply-accumulates — trading cheap recompute for the HBM stream.
    """

    MAX_NCLS = 16
    # raised Mosaic scoped-VMEM limit for this kernel (default is 16 MB;
    # the resident coefficient arrays live against it)
    VMEM_LIMIT = 100 * 1024 * 1024

    @classmethod
    def _vmem(cls, C: int, U: int, tu: int, itemsize: int) -> int:
        # per-TU footprint only (state ping-pong + streamed state tiles);
        # the resident coefficient arrays are checked after compression
        return (3 * 3 * C * U + 6 * 3 * C * tu) * itemsize

    def __init__(self, op: StencilOperator, interpret: bool = False):
        super().__init__(op, interpret)
        U, C = self.U, self.C
        data = op._data

        # exact per-macro class decomposition of the premultiplied blocks
        Dinv = op._dinv_np
        Fp = np.einsum("ucik,ucfkj->ucfij", Dinv, data.face_blocks)
        flat = np.ascontiguousarray(Fp.reshape(U, C, 27))
        _, ginv = np.unique(flat.reshape(U * C, 27), axis=0,
                            return_inverse=True)
        ginv = ginv.reshape(U, C)
        cls_of = np.zeros((U, C), np.int64)
        rep_c = np.zeros((U, self.MAX_NCLS), np.int64)
        ncls = 0
        for u in range(U):
            uniq, first, inv = np.unique(ginv[u], return_index=True,
                                         return_inverse=True)
            if len(uniq) > self.MAX_NCLS:
                raise ValueError(
                    f"{len(uniq)} coefficient classes in one macro "
                    f"(> {self.MAX_NCLS}) — mesh too irregular for the "
                    f"resident kernel")
            cls_of[u] = inv
            rep_c[u, :len(uniq)] = first
            ncls = max(ncls, len(uniq))
        ncls = max(8 * -(-ncls // 8), 8)        # sublane-pad to 8
        self.ncls = ncls

        # (3f,3i,3j,ncls,U) representatives + (C,U) int class map (the
        # expansion one-hot is rebuilt per tile in-kernel from an iota
        # compare — a full (ncls,C,U) one-hot would eat MBs of the tight
        # scoped-VMEM budget)
        Fpc = Fp[np.arange(U)[:, None], rep_c[:, :ncls]]   # (U, ncls, 3,3,3)

        itemsize = self.dtype.itemsize
        resident = (27 * ncls * U * itemsize + C * U * 4
                    + 3 * 3 * C * U * itemsize)
        if resident + self._vmem(C, U, self.TU, itemsize) > int(
                0.75 * self.VMEM_LIMIT):
            raise ValueError(
                f"resident phase kernel needs ~{resident >> 20} MB of "
                f"resident VMEM (C={C}, U={U}, ncls={ncls})")

        host = dict(
            Fpc_t=np.asarray(Fpc.transpose(2, 3, 4, 1, 0), self.dtype),
            cls_t=cls_of.transpose(1, 0).astype(np.int32),   # (C, U)
        )
        for key, val in jax.device_put(host).items():
            setattr(self, key, val)

    # -- kernel --------------------------------------------------------------
    def _kernel(self, offs_ref, coefs_ref, x0_ref, bp_ref, Fpc_ref, Xp_ref,
                cls_ref, srel_ref, sc_ref, ioh_ref, coh_ref,
                xout_ref, zout_ref, xab, bps):
        C, TU, W, m, nb = self.C, self.TU, self.W, self.m, self.nb
        ncls = self.ncls
        r = pl.program_id(0)
        t = pl.program_id(1)
        ts = pl.multiple_of(t * TU, TU)

        @pl.when(r == 0)
        def _load():
            xab[0, :, :, pl.ds(ts, TU)] = x0_ref[:]
            bps[:, :, pl.ds(ts, TU)] = bp_ref[:]
            xout_ref[:] = x0_ref[:]
            zout_ref[:] = jnp.zeros(zout_ref.shape, zout_ref.dtype)

        @pl.when(r > 0)
        def _sweep():
            pread = (r + 1) % 2
            pwrite = r % 2
            off_t = pl.multiple_of(offs_ref[t], self.ALIGN)
            xv = xab[pread, :, :, pl.ds(ts, TU)]             # (3, C, TU)
            band = xab[pread, :, :, pl.ds(off_t, W)]         # (3, C, W)
            ioh = ioh_ref[:]

            xg = [[_exact_dot(ioh[f], xv[j]) for j in range(3)]
                  for f in range(3)]

            sv = None
            if nb:
                srel = srel_ref[:]
                sc = sc_ref[:]
                band2 = band.reshape(3 * C, W)
                iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, TU), 0)
                iota_c = jax.lax.broadcasted_iota(jnp.int32, (m, C, TU), 1)
                parts = [[] for _ in range(3)]
                for mf in range(3):
                    mask = (iota_w == srel[mf][None, :]).astype(band2.dtype)
                    full = _exact_dot(band2, mask).reshape(3, C, TU)
                    sel = (iota_c == sc[mf][:, None, :]).astype(band2.dtype)
                    for j in range(3):
                        parts[j].append((full[j][None] * sel).sum(axis=1))
                sv = [jnp.concatenate(parts[j], axis=0) for j in range(3)]

            # expand class coefficients on the fly: wg[f][j] holds the
            # class-sliced state planes, contracted against the (TU,)
            # per-class coefficient rows — VPU recompute instead of the
            # (3,3,3,C,TU) HBM stream
            cls_t = cls_ref[:, pl.ds(ts, TU)]                 # (C, TU) int
            iota_n = jax.lax.broadcasted_iota(
                jnp.int32, (ncls, C, TU), 0)
            clsoh_t = (iota_n == cls_t[None]).astype(xv.dtype)
            wg = [[clsoh_t * xg[f][j][None] for j in range(3)]
                  for f in range(3)]                          # (ncls, C, TU)

            bpv = bps[:, :, pl.ds(ts, TU)]
            coef = coefs_ref[r]
            outs = []
            zs = []
            for i in range(3):
                acc = None
                for f in range(3):
                    for j in range(3):
                        for k in range(ncls):
                            fpc = Fpc_ref[f, i, j, k, pl.ds(ts, TU)]
                            term = fpc[None, :] * wg[f][j][k]
                            acc = term if acc is None else acc + term
                if nb:
                    Xp = Xp_ref[:]
                    coh = coh_ref[:]
                    cs = Xp[i, 0] * sv[0]
                    for j in range(1, 3):
                        cs = cs + Xp[i, j] * sv[j]
                    acc = acc + _exact_dot(coh, cs)
                z = bpv[i] - xv[i] - acc
                zs.append(z)
                outs.append(xv[i] + coef * z)
            xnew = jnp.stack(outs)
            xab[pwrite, :, :, pl.ds(ts, TU)] = xnew
            xout_ref[:] = xnew
            zout_ref[:] = jnp.stack(zs)

    # -- invocation ----------------------------------------------------------
    def _call(self, n_rounds: int):
        if n_rounds in self._calls:
            return self._calls[n_rounds]
        C, TU, U, nb, m = self.C, self.TU, self.U, self.nb, self.m
        ncls = self.ncls
        T = self.T
        dt = jnp.dtype(self.dtype)

        def im(*block):
            return lambda r, t, offs, coefs: block

        def im_t(*lead):
            return lambda r, t, offs, coefs: lead + (t,)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_rounds, T),
            in_specs=[
                pl.BlockSpec((3, C, TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),        # x0
                pl.BlockSpec((3, C, TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),        # bp
                # resident coefficient classes: constant index maps
                pl.BlockSpec((3, 3, 3, ncls, U), im(0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),        # Fpc
                pl.BlockSpec((3, 3, max(nb, 1), TU), im_t(0, 0, 0),
                             memory_space=pltpu.VMEM),        # Xp (per tile)
                pl.BlockSpec((C, U), im(0, 0),
                             memory_space=pltpu.VMEM),        # cls map
                pl.BlockSpec((3, TU), im_t(0,),
                             memory_space=pltpu.VMEM),        # src_rel
                pl.BlockSpec((3, max(m, 1), TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),        # src_c
                pl.BlockSpec((3, C, C), im(0, 0, 0),
                             memory_space=pltpu.VMEM),        # intra_oh
                pl.BlockSpec((C, max(nb, 1)), im(0, 0),
                             memory_space=pltpu.VMEM),        # cross_oh
            ],
            out_specs=[
                pl.BlockSpec((3, C, TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, C, TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 3, C, U), dt),
                pltpu.VMEM((3, C, U), dt),
            ],
        )
        call = pl.pallas_call(
            self._kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((3, C, U), dt),
                       jax.ShapeDtypeStruct((3, C, U), dt)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=self.VMEM_LIMIT),
            interpret=self.interpret,
        )
        self._calls[n_rounds] = call
        return call

    def phase(self, x_t, bp_t, coefs):
        n_rounds = len(coefs) + 2
        coefs_arr = jnp.asarray(
            np.concatenate([[0.0], np.asarray(coefs, np.float64), [0.0]])
            .astype(self.dtype))
        call = self._call(n_rounds)
        x_new, z = call(jnp.asarray(self.offs), coefs_arr, x_t, bp_t,
                        self.Fpc_t, self.Xp_g, self.cls_t, self.src_rel,
                        self.src_c, self.intra_oh, self.cross_oh)
        return x_new, z
