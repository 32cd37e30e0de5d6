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

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import StencilOperator
from ..mesh import splitting

_HIGHEST = jax.lax.Precision.HIGHEST


def _exact_dot(a, b):
    """MXU matmul that is EXACT for one-hot operands (f32 passthrough)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=_HIGHEST,
                               preferred_element_type=a.dtype)


class PhaseOperator:
    """Fused relaxation-phase kernels for one level's stencil operator."""

    # band alignment for the in-kernel dynamic slice (lane-dim offsets);
    # 128 (the lane tile) keeps the strip band W one alignment step
    # tighter than 256 — measured ~12% whole-phase gain (docs/PROFILE_r4)
    ALIGN = 128

    VMEM_BUDGET = 48 * 1024 * 1024
    # Mosaic scoped-VMEM limit passed to every call.  The round-3 "AOT
    # compiler crash" at C >= 256 was in fact a kernel-STACK scoped-vmem
    # OOM against the 16 MB default (the in-kernel one-hot temporaries at
    # large C need ~21 MB; scripts/repro_stream_aot.py captures the exact
    # PJRT error) — raising the limit fixes it.
    VMEM_LIMIT = 110 * 1024 * 1024

    # subclass switch: True keeps the premultiplied coefficient arrays
    # VMEM-resident (constant index maps) instead of streaming tiles
    COEF_RESIDENT = False

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
        single tile).  256 measured best at the production shapes (fewer
        grid steps than 128; beyond 256 the banded strip gather's W grows
        faster than the step count shrinks — docs/PROFILE_r4.md)."""
        cands = [tu for tu in (128, 256, 384, 512) if U % tu == 0]
        cands += [U] if U not in cands else []
        cands.sort(key=lambda tu: (tu != 256, tu != 128, tu))
        for tu in cands:
            if cls._vmem(C, U, tu, itemsize) <= cls.VMEM_BUDGET:
                return tu
        raise ValueError(
            f"phase kernel needs ~{cls._vmem(C, U, cands[0], itemsize) >> 20}"
            f" MB VMEM (C={C}, U={U}) — falling back to the XLA stencil "
            f"path")

    def __init__(self, op: StencilOperator, interpret: bool = False,
                 wmin: int = 0):
        self.op = op
        self.interpret = interpret
        data = op._data
        U, C, nb = op.U, op.C, op.nb
        self.U, self.C, self.nb = U, C, nb
        dtype = np.dtype(op.S_t.dtype)    # no device readback
        self.dtype = dtype
        self.TU = self._pick_tu(U, C, dtype.itemsize)
        self.T = U // self.TU

        # slot regrouping: canonical slot order -> (face group, position);
        # F = 3 macro faces, or 3*p groups on a macro-packed level
        from .stencil import slot_groups
        _, groups, F = slot_groups(data)
        self.F = F
        m = nb // F if nb else 0
        assert all(len(g) == m for g in groups)
        self.m = m
        order = np.concatenate(groups) if nb else np.zeros((0,), np.int64)

        hs = np.asarray(data.halo_src)                       # (U, nb)
        if nb:
            src_c = (hs % C)[:, order].T.reshape(F, m, U)    # (F, m, U)
            src_u = (hs // C)[:, order].T.reshape(F, m, U)
            # all slots of one face group source the same neighbor macro
            assert (src_u == src_u[:, :1]).all()
            src_u = src_u[:, 0]                              # (F, U)
        else:
            src_c = np.zeros((F, 1, U), np.int64)
            src_u = np.zeros((F, U), np.int64)

        # per-tile band: [off_t, off_t + W) must cover every source macro;
        # aligned_band keeps each offset a true multiple of ALIGN (the
        # pl.multiple_of promise in the kernel) by widening W as needed
        from .banding import aligned_band
        lo = src_u.reshape(F, self.T, self.TU).min(axis=(0, 2))
        hi = src_u.reshape(F, self.T, self.TU).max(axis=(0, 2))
        W, offs = aligned_band(lo, hi, U, self.ALIGN, wmin=wmin)
        self.W = W
        self.offs = offs.astype(np.int32)                    # (T,)
        self.src_rel = (src_u
                        - offs[(np.arange(U) // self.TU)][None]).astype(
                            np.int32)                        # (F, U)
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
        self._host = host
        for key, val in jax.device_put(host).items():
            setattr(self, key, val)
        self._calls: dict = {}

    def arg_tables_host(self) -> dict:
        """All per-mesh call-argument tables as HOST numpy arrays — the
        distributed solver stacks these per device and feeds them back
        through phase_with() inside shard_map."""
        return dict(self._host, offs=self.offs,
                    Fp_t=np.asarray(self.op._host["Fp_t"]),
                    intra_oh=np.asarray(self.op._host["intra_oh"]))

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
            # COEF_RESIDENT: the whole (3,3,3,C,U) block lives in VMEM
            # (fetched once per phase); slice this tile's lanes
            Fp = (Fp_ref[:, :, :, :, pl.ds(ts, TU)]
                  if self.COEF_RESIDENT else Fp_ref[:])

            # intra-macro neighbor planes: exact one-hot matmuls
            xg = [[_exact_dot(ioh[f], xv[j]) for j in range(3)]
                  for f in range(3)]

            # cross-macro strips: banded one-hot matmul over the macro axis,
            # then per-slot child selection — all data VMEM-resident.
            # F face groups (3, or 3*p on a packed level)
            sv = None
            if nb:
                srel = srel_ref[:]                           # (F, TU)
                sc = sc_ref[:]                               # (F, m, TU)
                band2 = band.reshape(3 * C, W)
                iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, TU), 0)
                iota_c = jax.lax.broadcasted_iota(
                    jnp.int32, (m, C, TU), 1)
                sv = []                                      # [j] -> (nb, TU)
                parts = [[] for _ in range(3)]
                for mf in range(self.F):
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
                    Xp = (Xp_ref[:, :, :, pl.ds(ts, TU)]
                          if self.COEF_RESIDENT else Xp_ref[:])
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

        if self.COEF_RESIDENT:
            # constant index maps: the coefficient blocks are fetched into
            # VMEM once and reused by every (round, tile) step
            fp_spec = pl.BlockSpec((3, 3, 3, C, U), im(0, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
            xp_spec = pl.BlockSpec((3, 3, max(nb, 1), U), im(0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
        else:
            fp_spec = pl.BlockSpec((3, 3, 3, C, TU), im_t(0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
            xp_spec = pl.BlockSpec((3, 3, max(nb, 1), TU), im_t(0, 0, 0),
                                   memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_rounds, T),
            in_specs=[
                pl.BlockSpec((3, C, TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),        # x0
                pl.BlockSpec((3, C, TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),        # bp
                fp_spec,                                      # Fp
                xp_spec,                                      # Xp
                pl.BlockSpec((self.F, TU), im_t(0,),
                             memory_space=pltpu.VMEM),        # src_rel
                pl.BlockSpec((self.F, max(m, 1), TU), im_t(0, 0),
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

    def phase(self, x_t, bp_t, coefs, want_z: bool = True):
        """Run one relaxation phase: len(coefs) rounds over the whole mesh.

        Args:
          x_t:   (3, C, U) state in transposed layout
          bp_t:  (3, C, U) premultiplied RHS D^-1 (b - c_aff)
          coefs: python list of per-round step sizes (1/root_k or omega)
          want_z: False skips the trailing coef-0 residual round — the
            returned z is one round STALE and must not be used.  Callers
            that only need the smoothed state (post-smooth, coarse-level
            phases) save one full grid round per phase (~6-12%).
        Returns:
          (x_new, z) with z = D^-1 (b - A x_new) — multiply by the self
          blocks (StencilOperator.mul_self) to get the true residual.
        """
        tabs = dict(offs=jnp.asarray(self.offs), Fp_t=self.Fp_t,
                    Xp_g=self.Xp_g, src_rel=self.src_rel, src_c=self.src_c,
                    intra_oh=self.intra_oh, cross_oh=self.cross_oh)
        return self.phase_with(tabs, x_t, bp_t, coefs, want_z)

    def _coefs_arr(self, coefs, want_z: bool):
        tail = [0.0] if want_z else []
        return jnp.asarray(
            np.concatenate([[0.0], np.asarray(coefs, np.float64), tail])
            .astype(self.dtype))

    def phase_with(self, tabs: dict, x_t, bp_t, coefs,
                   want_z: bool = True):
        """phase() with the per-mesh tables passed explicitly — lets the
        distributed solver reuse ONE kernel with per-device (extended-
        domain) tables inside shard_map."""
        n_rounds = len(coefs) + 1 + int(want_z)
        coefs_arr = self._coefs_arr(coefs, want_z)
        call = self._call(n_rounds)
        x_new, z = call(tabs["offs"], coefs_arr, x_t, bp_t,
                        tabs["Fp_t"], tabs["Xp_g"], tabs["src_rel"],
                        tabs["src_c"], tabs["intra_oh"], tabs["cross_oh"])
        return x_new, z

    def mul_self(self, z_t):
        """r = D z (self blocks) — turns the kernel's z into b - A x."""
        S = self.S_t
        return jnp.stack([
            S[i, 0] * z_t[0] + S[i, 1] * z_t[1] + S[i, 2] * z_t[2]
            for i in range(3)])


class PhaseOperatorCoefResident(PhaseOperator):
    """Streaming-kernel structure with VMEM-RESIDENT coefficients.

    The best of both earlier kernels at SMALL child counts: the compact
    (unpadded) child axis and one-hot intra gathers of the streaming V1
    kernel — whose arithmetic is half the padded lattice's — but the
    premultiplied coefficient blocks are constant-index-map inputs fetched
    into VMEM once per phase instead of re-streamed every round (the
    dominant HBM traffic of the whole V-cycle at C <= 16: 81 coefficient
    planes x rounds).  Feasible while ~90*C*U floats fit VMEM, i.e.
    C <= 16 at production U; larger C falls back to streaming or the
    padded lattice kernel (make_phase).
    """

    COEF_RESIDENT = True
    VMEM_LIMIT = 110 * 1024 * 1024
    VMEM_BUDGET = int(0.85 * VMEM_LIMIT)

    @classmethod
    def _vmem(cls, C: int, U: int, tu: int, itemsize: int) -> int:
        resident = (81 + 9) * C * U           # Fp + Xp upper bound
        scratch = 9 * C * U                   # state ping-pong + bp
        tiles = 4 * 3 * C * tu * 2
        return (resident + scratch + tiles) * itemsize


def _lattice_layout(s: int):
    """Padded-lattice child layout with CONSTANT neighbor offsets.

    Children of split depth ``s`` are re-indexed onto two (2**s, 2**s)
    square grids — plane 0 holds the up triangles at (row-1)*m + q, plane 1
    the down triangles — so that every intra-macro face neighbor sits at a
    FIXED sublane offset: up children read (+off_f), down children (-off_f)
    with off = (m*m - m + 1, m*m, m*m + 1) for child faces (0, 1, 2).
    (Row-major child order needs 2*(2**s - 1) distinct offsets for face 0 —
    the row length shrinks per row — which forced the V1 kernel into O(C^2)
    one-hot matmul gathers; the square lattice restores translation
    invariance, the same trick as padding a triangular loop nest.)

    Returns (perm (C,) padded index per child, Cp, offsets (3,), up_rows,
    down_rows boolean (Cp,) masks).
    """
    C = 4 ** s
    m = 2 ** s
    Cp = 2 * m * m
    verts, ud = splitting.child_lattice(s)
    r = np.where(ud > 0, verts[:, 1, 1], verts[:, 2, 1])     # row, 1-based
    q = verts[:, 2, 0]
    perm = np.where(ud > 0, 0, m * m) + (r - 1) * m + q
    assert len(np.unique(perm)) == C
    offsets = np.asarray([m * m - m + 1, m * m, m * m + 1], np.int64)
    cn = splitting.child_neighbors(s)
    for f in range(3):
        for sign, sel in ((1, ud > 0), (-1, ud < 0)):
            pair = sel & (cn[:, f] >= 0)
            if pair.any():
                d = perm[cn[pair, f]] - perm[pair]
                assert (d == sign * offsets[f]).all(), (
                    f"lattice offset broken at s={s} f={f}")
    up_rows = np.zeros(Cp, bool)
    dn_rows = np.zeros(Cp, bool)
    up_rows[perm[ud > 0]] = True
    dn_rows[perm[ud < 0]] = True
    return perm.astype(np.int64), Cp, offsets, up_rows, dn_rows


class PhaseOperatorResident(PhaseOperator):
    """Phase kernel with VMEM-resident coefficients on a padded lattice.

    Two structural upgrades over the streaming V1 kernel, aimed at deep
    n_split (large C) where V1 disables itself:

    1. **Resident coefficients.**  V1 re-streams the (3,3,3,C,U)
       premultiplied block tensor from HBM every round — the dominant
       traffic of the whole V-cycle — and its double-buffered tiles stop
       fitting VMEM at C=1024.  Here every coefficient array is a
       constant-index-map block: fetched into VMEM once, reused by all
       rounds and tiles.  Per-round HBM traffic drops to zero (state and
       partials live in scratch), so the phase runs at VPU/MXU speed.

    2. **Lattice shift gathers.**  V1 gathers the three intra-macro
       neighbor planes with (C, C) one-hot matmuls — O(C^2) MXU work that
       dwarfs the O(C) arithmetic at C=1024.  On the padded square lattice
       (``_lattice_layout``) each child face neighbor sits at one of three
       FIXED sublane offsets (sign flipped for down triangles), so the
       gather is 18 static slices of the zero-padded state scratch plus
       up/down row masks — O(C) VPU work, no MXU, exact.

    The cross-macro strip exchange keeps V1's banded design, but packs the
    strip rows once per round (one (nbc, Cp) one-hot matmul into scratch at
    tile 0) so the per-slot selection shrinks from (m, C, TU) masks to
    (m, nbc, TU).

    Replaces the reference's per-sweep halo exchange + smoother loops
    (/root/reference/transport_tri_semi.F90:543-722, splitting.F90:
    1210-1398); the 4^-s/2^s geometry scalings (ShapFun.F90:1654-1682) are
    what make the per-child coefficient planes well-defined at every depth.
    """

    # raised Mosaic scoped-VMEM limit for this kernel (default 16 MB; the
    # resident coefficient arrays live against it)
    VMEM_LIMIT = 110 * 1024 * 1024

    def __init__(self, op: StencilOperator, interpret: bool = False,
                 wmin: int = 0):
        if getattr(op._data, "slot_mf", None) is not None:
            raise ValueError("resident lattice kernel: packed levels are "
                             "not on the splitting lattice")
        # deliberately NOT calling super().__init__: the streaming kernel's
        # table construction (and its VMEM check) does not apply here
        self.op = op
        self.interpret = interpret
        data = op._data
        U, C, nb = op.U, op.C, op.nb
        self.U, self.C, self.nb = U, C, nb
        dtype = np.dtype(op.S_t.dtype)
        self.dtype = dtype
        s = int(round(np.log(C) / np.log(4))) if C > 1 else 0
        m = 2 ** s

        perm, Cp, offsets, up_rows, dn_rows = _lattice_layout(s)
        self.Cp = Cp
        self.offs3 = tuple(int(o) for o in offsets)
        # sublane padding of the state scratch: the shifted slices read
        # [P + c +- off) and must land in zero padding when out of plane
        self.P = 8 * -(-int(offsets.max()) // 8)
        self.Hp = Cp + 2 * self.P
        self.perm = perm

        # strip packing (same grouping as V1, but rows live at padded ids)
        mf_of = splitting.CHILD2MACRO_FACE[data.bnd_f]       # (nb,)
        groups = [np.nonzero(mf_of == mf)[0] for mf in range(3)]
        m_slots = nb // 3 if nb else 0
        self.m = m_slots
        order = (np.concatenate(groups) if nb
                 else np.zeros((0,), np.int64))

        hs = np.asarray(data.halo_src)                       # (U, nb)
        if nb:
            src_c = (hs % C)[:, order].T.reshape(3, m_slots, U)
            src_u = (hs // C)[:, order].T.reshape(3, m_slots, U)
            assert (src_u == src_u[:, :1]).all()
            src_u = src_u[:, 0]                              # (3, U)
        else:
            src_c = np.zeros((3, 1, U), np.int64)
            src_u = np.zeros((3, U), np.int64)

        uniq_c = np.unique(data.bnd_c) if nb else np.zeros((1,), np.int64)
        nbc = len(uniq_c)
        self.nbc = 8 * -(-nbc // 8)                          # sublane pad
        qpos = np.zeros(C, np.int64)
        qpos[uniq_c] = np.arange(nbc)
        pack_oh = np.zeros((self.nbc, Cp))
        pack_oh[np.arange(nbc), perm[uniq_c]] = 1.0

        # macro-axis tiling + aligned strip band (shared helper)
        from .banding import aligned_band
        self.TU = self._pick_tu_res(U)
        self.T = U // self.TU
        lo = src_u.reshape(3, self.T, self.TU).min(axis=(0, 2))
        hi = src_u.reshape(3, self.T, self.TU).max(axis=(0, 2))
        W, offs = aligned_band(lo, hi, U, self.ALIGN, wmin=wmin)
        self.W = W
        self.offs = offs.astype(np.int32)
        self.src_rel = (src_u - offs[(np.arange(U) // self.TU)][None]
                        ).astype(np.int32)                   # (3, U)

        # resident premultiplied blocks at padded rows
        Dinv = op._dinv_np
        Fp = np.einsum("ucik,ucfkj->ucfij", Dinv, data.face_blocks)
        Fp_pad = np.zeros((3, 3, 3, Cp, U), dtype)
        Fp_pad[:, :, :, perm, :] = np.asarray(
            Fp.transpose(2, 3, 4, 1, 0), dtype)              # f,i,j,c,u
        Xp = (np.einsum("usik,uskj->usij", Dinv[:, data.bnd_c],
                        data.cross_blocks) if nb else data.cross_blocks)
        coh = np.zeros((Cp, max(nb, 1)))
        if nb:
            coh[perm[np.asarray(data.bnd_c)[order]], np.arange(nb)] = 1.0
        masks = np.zeros((2, Cp, 1), dtype)
        masks[0, up_rows, 0] = 1.0
        masks[1, dn_rows, 0] = 1.0

        if self._vmem_resident(self.TU) > int(0.85 * self.VMEM_LIMIT):
            raise ValueError(
                f"resident phase kernel needs ~"
                f"{self._vmem_resident(self.TU) >> 20} MB VMEM "
                f"(Cp={Cp}, U={U}) — falling back")

        host = dict(
            Fp_pad=Fp_pad,
            Xp_g=(np.asarray(Xp[:, order].transpose(2, 3, 1, 0), dtype)
                  if nb else np.zeros((3, 3, 1, U), dtype)),
            pack_oh=np.asarray(pack_oh, dtype),
            cross_oh_pad=np.asarray(coh, dtype),
            masks=masks,
            src_rel=self.src_rel,
            src_cp=qpos[src_c].astype(np.int32),             # (3, m, U)
        )
        self._host = host
        for key, val in jax.device_put(host).items():
            setattr(self, key, val)
        self.S_t = op.S_t                                    # for mul_self
        self._calls: dict = {}

    def arg_tables_host(self) -> dict:
        return dict(self._host, offs=self.offs)

    def _pick_tu_res(self, U: int) -> int:
        # larger tiles amortize the per-(round, tile) dynamic lane slices
        # into the resident coefficient arrays — but a whole-axis tile at
        # production U (T=1, TU~8k) sends the Mosaic compile into the
        # 10+ minute range, so the preference is bounded at 512
        cands = [tu for tu in (512, 384, 256, 128) if U % tu == 0]
        cands += [U] if U not in cands else []
        if U > 1024 and U in cands:
            cands.remove(U)
            cands.append(U)       # big whole-axis tiles only as last resort
        for tu in cands:
            if self._vmem_resident(tu) <= int(0.85 * self.VMEM_LIMIT):
                return tu
        return cands[-1]          # final check in __init__ raises

    def _vmem_resident(self, tu: int) -> int:
        """Whole-kernel VMEM footprint: resident blocks + scratch + tiles."""
        it = self.dtype.itemsize
        U, Cp, Hp, nb, nbc = self.U, self.Cp, self.Hp, self.nb, self.nbc
        resident = (27 * Cp * U + 9 * max(nb, 1) * U + nbc * Cp
                    + Cp * max(nb, 1) + 2 * Cp) * it
        scratch = (2 * 3 * Hp * U + 3 * Cp * U + 3 * nbc * U) * it
        tiles = (4 * 3 * Cp * tu) * it * 2
        return resident + scratch + tiles

    # -- kernel --------------------------------------------------------------
    def _kernel(self, offs_ref, coefs_ref, x0_ref, bp_ref, Fp_ref, Xp_ref,
                pack_ref, coh_ref, mask_ref, srel_ref, scp_ref,
                xout_ref, zout_ref, xab, bps, strip):
        Cp, P, TU, W, nb, nbc = (self.Cp, self.P, self.TU, self.W, self.nb,
                                 self.nbc)
        m = self.m
        r = pl.program_id(0)
        t = pl.program_id(1)
        ts = pl.multiple_of(t * TU, TU)
        # lane tile slice: T > 1 guarantees TU is a 128-multiple (aligned
        # dynamic lane offsets); a single tile reads the whole lane axis
        lsl = slice(None) if self.T == 1 else pl.ds(ts, TU)

        @pl.when(r == 0)
        def _load():
            # zero BOTH ping-pong buffers (padding rows must stay zero: the
            # shifted neighbor slices rely on reading exact zeros there)
            xab[:, :, :, lsl] = jnp.zeros(
                (2, 3, self.Hp, TU), xab.dtype)
            xab[0, :, P:P + Cp, lsl] = x0_ref[:]
            bps[:, :, lsl] = bp_ref[:]
            xout_ref[:] = x0_ref[:]
            zout_ref[:] = jnp.zeros(zout_ref.shape, zout_ref.dtype)

        @pl.when(r > 0)
        def _sweep():
            pread = (r + 1) % 2          # round 1 reads buffer 0
            pwrite = r % 2

            # pack the strip children rows once per round (tile 0): one
            # one-hot matmul over the full macro axis into scratch
            @pl.when(t == 0)
            def _pack():
                if nb:
                    pack = pack_ref[:]                       # (nbc, Cp)
                    for j in range(3):
                        strip[j, :, :] = _exact_dot(
                            pack, xab[pread, j, P:P + Cp, :])

            xv = xab[pread, :, P:P + Cp, lsl]                # (3, Cp, TU)
            up = mask_ref[0]                                 # (Cp, 1)
            dn = mask_ref[1]

            # intra-macro neighbors: static shifted slices of the padded
            # state — up rows read +off, down rows -off, padding rows and
            # cross-plane spill read exact zeros (masked anyway)
            xg = [[None] * 3 for _ in range(3)]
            for f, off in enumerate(self.offs3):
                for j in range(3):
                    sp_ = xab[pread, j, P + off:P + off + Cp, lsl]
                    sm_ = xab[pread, j, P - off:P - off + Cp, lsl]
                    xg[f][j] = up * sp_ + dn * sm_

            # cross-macro strips: banded one-hot over the macro axis of the
            # PACKED strip rows, then per-slot selection over the nbc
            # packed rows (not all C children)
            sv = None
            if nb:
                if W == self.U:
                    band2 = strip[:, :, :].reshape(3 * nbc, W)
                else:
                    off_t = pl.multiple_of(offs_ref[t], self.ALIGN)
                    band2 = strip[:, :, pl.ds(off_t, W)].reshape(
                        3 * nbc, W)
                srel = srel_ref[:]                           # (3, TU)
                scp = scp_ref[:]                             # (3, m, TU)
                iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, TU), 0)
                iota_q = jax.lax.broadcasted_iota(
                    jnp.int32, (m, nbc, TU), 1)
                parts = [[] for _ in range(3)]
                for mf in range(3):
                    msk = (iota_w == srel[mf][None, :]).astype(band2.dtype)
                    full = _exact_dot(band2, msk).reshape(3, nbc, TU)
                    sel = (iota_q == scp[mf][:, None, :]).astype(
                        band2.dtype)
                    for j in range(3):
                        parts[j].append((full[j][None] * sel).sum(axis=1))
                sv = [jnp.concatenate(parts[j], axis=0)      # (nb, TU)
                      for j in range(3)]

            bpv = bps[:, :, lsl]
            coef = coefs_ref[r]
            outs = []
            zs = []
            for i in range(3):
                acc = None
                for f in range(3):
                    for j in range(3):
                        term = Fp_ref[f, i, j, :, lsl] * xg[f][j]
                        acc = term if acc is None else acc + term
                if nb:
                    cs = Xp_ref[i, 0, :, lsl] * sv[0]
                    for j in range(1, 3):
                        cs = cs + Xp_ref[i, j, :, lsl] * sv[j]
                    acc = acc + _exact_dot(coh_ref[:], cs)
                z = bpv[i] - xv[i] - acc
                zs.append(z)
                outs.append(xv[i] + coef * z)
            xnew = jnp.stack(outs)
            xab[pwrite, :, P:P + Cp, lsl] = xnew
            xout_ref[:] = xnew
            zout_ref[:] = jnp.stack(zs)

    # -- invocation ----------------------------------------------------------
    def _call(self, n_rounds: int):
        if n_rounds in self._calls:
            return self._calls[n_rounds]
        Cp, TU, U, nb, nbc = self.Cp, self.TU, self.U, self.nb, self.nbc
        m = max(self.m, 1)
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
                pl.BlockSpec((3, Cp, TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),        # x0
                pl.BlockSpec((3, Cp, TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),        # bp
                # everything below: constant index maps -> VMEM-resident,
                # fetched from HBM exactly once for the whole phase
                pl.BlockSpec((3, 3, 3, Cp, U), im(0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),        # Fp_pad
                pl.BlockSpec((3, 3, max(nb, 1), U), im(0, 0, 0, 0),
                             memory_space=pltpu.VMEM),        # Xp
                pl.BlockSpec((nbc, Cp), im(0, 0),
                             memory_space=pltpu.VMEM),        # pack_oh
                pl.BlockSpec((Cp, max(nb, 1)), im(0, 0),
                             memory_space=pltpu.VMEM),        # cross_oh_pad
                pl.BlockSpec((2, Cp, 1), im(0, 0, 0),
                             memory_space=pltpu.VMEM),        # up/dn masks
                pl.BlockSpec((3, TU), im_t(0,),
                             memory_space=pltpu.VMEM),        # src_rel
                pl.BlockSpec((3, max(self.m, 1), TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),        # src_cp
            ],
            out_specs=[
                pl.BlockSpec((3, Cp, TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, Cp, TU), im_t(0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 3, self.Hp, U), dt),           # state
                pltpu.VMEM((3, Cp, U), dt),                   # bp
                pltpu.VMEM((3, nbc, U), dt),                  # packed strips
            ],
        )
        call = pl.pallas_call(
            self._kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((3, Cp, U), dt),
                       jax.ShapeDtypeStruct((3, Cp, U), dt)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=self.VMEM_LIMIT),
            interpret=self.interpret,
        )
        self._calls[n_rounds] = call
        return call

    def phase(self, x_t, bp_t, coefs, want_z: bool = True):
        """Same contract as PhaseOperator.phase: (3, C, U) in/out."""
        tabs = dict(offs=jnp.asarray(self.offs), Fp_pad=self.Fp_pad,
                    Xp_g=self.Xp_g, pack_oh=self.pack_oh,
                    cross_oh_pad=self.cross_oh_pad, masks=self.masks,
                    src_rel=self.src_rel, src_cp=self.src_cp)
        return self.phase_with(tabs, x_t, bp_t, coefs, want_z)

    def phase_with(self, tabs: dict, x_t, bp_t, coefs,
                   want_z: bool = True):
        n_rounds = len(coefs) + 1 + int(want_z)
        coefs_arr = self._coefs_arr(coefs, want_z)
        call = self._call(n_rounds)
        perm = jnp.asarray(self.perm)
        pad = jnp.zeros((3, self.Cp, self.U), x_t.dtype)
        x_pad = pad.at[:, perm].set(x_t)
        bp_pad = pad.at[:, perm].set(bp_t)
        x_new, z = call(tabs["offs"], coefs_arr, x_pad, bp_pad,
                        tabs["Fp_pad"], tabs["Xp_g"], tabs["pack_oh"],
                        tabs["cross_oh_pad"], tabs["masks"],
                        tabs["src_rel"], tabs["src_cp"])
        return x_new[:, perm], z[:, perm]


def make_phase(op: StencilOperator, interpret: bool = False,
               impl: str = "auto", wmin: int = 0):
    """Best available fused phase kernel for one level's operator.

    ``auto`` picks by child count: the streaming V1 kernel at C <= 64
    (its coefficient stream pipelines well and measured slightly faster
    at shallow n_split), the resident lattice kernel beyond (its O(C)
    shift gathers replace V1's O(C^2) one-hot matmuls, and V1's large-C
    configurations have crashed the TPU AOT compiler).  Falls through to
    the other kernel on infeasibility, then to None (the XLA stencil
    path).  ``resident``/``stream`` force one implementation (raising
    its ValueError on infeasibility).
    """
    if impl == "resident":
        return PhaseOperatorResident(op, interpret=interpret, wmin=wmin)
    if impl == "stream":
        return PhaseOperator(op, interpret=interpret, wmin=wmin)
    if impl == "coef_resident":
        return PhaseOperatorCoefResident(op, interpret=interpret,
                                         wmin=wmin)
    if impl != "auto":
        raise ValueError(f"unknown phase_impl {impl!r}")
    # small C on safe shapes: resident-coefficient kernel first (fastest:
    # compact child axis AND zero per-round coefficient traffic), then
    # streaming; the padded-lattice kernel handles deep C and the shapes
    # that crash the streaming kernel's AOT compile (C >= 256 or
    # U % 128 != 0, scripts/repro_stream_aot.py).  Macro-packed levels
    # (slot_mf set) are not on the splitting lattice — the lattice kernel
    # is excluded for them.
    packed = getattr(op._data, "slot_mf", None) is not None
    stream_ok = op.C <= 64 and op.U % 128 == 0
    if packed:
        order = [PhaseOperatorCoefResident, PhaseOperator]
    elif stream_ok:
        order = [PhaseOperatorCoefResident, PhaseOperator,
                 PhaseOperatorResident]
    else:
        order = [PhaseOperatorResident, PhaseOperator]
    for cls in order:
        try:
            return cls(op, interpret=interpret, wmin=wmin)
        except ValueError as e:
            err = e
    print(f"pallas_phase disabled: {err}")
    return None
