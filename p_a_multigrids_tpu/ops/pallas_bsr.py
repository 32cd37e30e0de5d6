"""Pallas TPU kernel: block-sparse (ELL/BSR) SpMV over a banded row order.

The generic ``BSR.spmv`` (ops/bsr.py) lowers to an XLA gather of the
neighbor vectors, which runs ~50x off HBM bandwidth on TPU — gathers, not
FLOPs, are the cost of sparse matvec on this hardware.  This kernel removes
the gather the same way the relaxation-phase kernel does (ops/
pallas_stencil.py): macro elements are RCM-ordered, so every block row's
column indices lie within a narrow band of the row index.  The whole
multiplicand ``x`` sits VMEM-resident (one block, constant index map); each
row tile slices its band from it and gathers the K neighbor vectors with
an iota one-hot matmul on the MXU (``Precision.HIGHEST`` keeps one-hot
matmuls exact: each output sums exactly one f32 product).

This is the BSR SpMV metric kernel of the benchmark — the TPU-native form
of the reference's ``csr_mul_array`` (/root/reference/matrices.F90:172-193)
on its preallocated fixed sparsity (matrices.F90:573-586).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bsr import BSR

_HIGHEST = jax.lax.Precision.HIGHEST


def _exact_dot(a, b):
    """MXU matmul that is EXACT for one-hot operands (f32 passthrough)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=_HIGHEST,
                               preferred_element_type=a.dtype)


class PallasSpMV:
    """y = A @ x as one Pallas kernel, for banded fixed-degree BSR.

    Requires the rows to be ordered so that every ``cols[e, k]`` lies within
    a bounded distance of ``e`` (RCM macro order + child-major flattening
    gives bands of a few thousand rows on the zoo meshes); raises
    ValueError when the band or the VMEM footprint is unusable, so callers
    can fall back to ``A.spmv``.

    ``group`` exploits block structure in the row order (rows e = u*group +
    c, e.g. group = children-per-macro): the gather one-hot then acts on
    the GROUP axis — a band of E/group columns instead of E — and a second
    tiny one-hot selects the member within each gathered group.  Mask
    materialization bandwidth, not FLOPs, is what bounds one-hot gathers,
    so shrinking the mask ~group-fold is the difference between losing and
    winning against the XLA gather.  When ``cols[:, 0]`` is the identity
    (the self block, as ops.bsr.build lays out), slot 0 skips the gather
    entirely and reads its tile directly.
    """

    # lane-dim alignment of the dynamic band slice: 128 (the hardware lane
    # tile) measured 20% faster than 256 — the band W shrinks by a tile
    ALIGN = 128
    VMEM_BUDGET = 48 * 1024 * 1024

    @staticmethod
    def _pick_tr(E: int, group: int) -> int:
        # bigger row tiles amortize the per-tile band slice (512 measured
        # ~10% over 256); fall back to any divisor compatible with group
        for tr in (512, 256):
            if E % tr == 0 and tr % group == 0:
                return tr
        if E <= 512:
            return E
        for tr in range(512, group - 1, -1):
            if E % tr == 0 and tr % group == 0:
                return tr
        raise ValueError(f"E={E} has no usable row tile width")

    def __init__(self, A: BSR, interpret: bool = False, group: int = 1,
                 src_rows: int | None = None):
        cols = np.asarray(A.cols)
        vals = np.asarray(A.vals)
        E, K = cols.shape
        b = vals.shape[-1]
        dtype = vals.dtype
        # rectangular operators (e.g. multigrid transfers): the gathered
        # source vector has src_rows block rows independent of the E
        # output rows; cols index the SOURCE space
        S = E if src_rows is None else int(src_rows)
        if group < 1 or E % group or S % group:
            raise ValueError(f"group={group} must divide E={E} and S={S}")
        self.E, self.K, self.b, self.G, self.S = E, K, b, group, S
        self.interpret = interpret
        TR = self._pick_tr(E, group)
        self.TR = TR
        self.T = E // TR

        # self-block shortcut: slot 0 is the identity column in bsr.build's
        # layout; its gather is just the row tile itself (square only)
        self.self0 = bool(S == E and (cols[:, 0] == np.arange(E)).all())
        k0 = 1 if self.self0 else 0
        self.KG = K - k0          # slots that go through the gather
        gcols = cols[:, k0:] // group                      # (E, KG) group ids
        mcols = (cols[:, k0:] % group).astype(np.int32)    # member within

        # per-tile band [off_t, off_t + W) on the GROUP axis; aligned_band
        # keeps every offset a true multiple of ALIGN (the pl.multiple_of
        # promise below) by widening W instead of clamping off the grid
        EG = S // group
        if self.KG:
            lo = gcols.reshape(self.T, -1).min(axis=1)
            hi = gcols.reshape(self.T, -1).max(axis=1)
        else:  # degenerate: diagonal matrix
            lo = hi = np.zeros(self.T, np.int64)
        from .banding import aligned_band
        W, offs = aligned_band(lo, hi, EG, self.ALIGN)
        self.W = W
        self.offs = jnp.asarray(offs.astype(np.int32))

        KW = max(self.KG, 1)
        vmem = (b * E + b * S                  # x rows + x grouped
                + K * b * b * TR * 2           # vals tiles (double-buffered)
                + b * group * W                # band
                + W * KW * TR                  # gather mask
                + b * group * KW * TR          # gathered groups
                ) * dtype.itemsize
        if vmem > self.VMEM_BUDGET:
            raise ValueError(
                f"spmv kernel needs ~{vmem >> 20} MB VMEM (E={E}, W={W}) — "
                f"falling back to the XLA BSR path")

        rel = (gcols - offs[np.arange(E) // TR, None]).astype(np.int32)
        host = dict(
            rel_t=rel.T.copy() if self.KG else np.zeros((1, E), np.int32),
            mem_t=(mcols.T.copy() if self.KG
                   else np.zeros((1, E), np.int32)),       # (KG, E)
            vals_t=vals.transpose(1, 2, 3, 0).copy(),      # (K, b, b, E)
        )
        for key, val in jax.device_put(host).items():
            setattr(self, key, val)
        self._call_cached = None

    # -- kernel ---------------------------------------------------------
    def _kernel(self, offs_ref, xr_ref, xg_ref, rel_ref, mem_ref, vals_ref,
                y_ref):
        K, KG, b, G, W, TR = (self.K, self.KG, self.b, self.G, self.W,
                              self.TR)
        t = pl.program_id(0)
        vals = vals_ref[:]                                 # (K, b, b, TR)
        gath = []                                          # K x (b, TR)
        if self.self0:
            gath.append(xr_ref[:])                         # (b, TR) row tile
        if KG:
            off_t = pl.multiple_of(offs_ref[t], self.ALIGN)
            band = xg_ref[:, pl.ds(off_t, W)]              # (b*G, W)
            rel = rel_ref[:].reshape(1, KG * TR)
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, KG * TR), 0)
            mask = (iota_w == rel).astype(band.dtype)
            # gather whole groups: (b*G, KG*TR) on the MXU
            full = _exact_dot(band, mask).reshape(b, G, KG * TR)
            # select the member within each group (tiny one-hot, VPU)
            iota_g = jax.lax.broadcasted_iota(jnp.int32, (G, KG * TR), 0)
            sel = (iota_g == mem_ref[:].reshape(1, KG * TR)).astype(
                band.dtype)
            g_all = (full * sel[None]).sum(axis=1)         # (b, KG*TR)
            g_all = g_all.reshape(b, KG, TR)
            for kk in range(KG):
                gath.append(g_all[:, kk])
        acc = [None] * b
        for k in range(K):
            g = gath[k]
            for i in range(b):
                term = vals[k, i, 0] * g[0]
                for j in range(1, b):
                    term = term + vals[k, i, j] * g[j]
                acc[i] = term if acc[i] is None else acc[i] + term
        y_ref[:] = jnp.stack(acc)

    def _call(self):
        if self._call_cached is not None:
            return self._call_cached
        E, K, b, G, TR = self.E, self.K, self.b, self.G, self.TR
        KW = max(self.KG, 1)
        dt = self.vals_t.dtype

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(self.T,),
            in_specs=[
                pl.BlockSpec((b, TR), lambda t, offs: (0, t),
                             memory_space=pltpu.VMEM),     # x row tile
                # whole grouped x, constant index map -> VMEM-resident
                pl.BlockSpec((b * G, self.S // G), lambda t, offs: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KW, TR), lambda t, offs: (0, t),
                             memory_space=pltpu.VMEM),     # rel group ids
                pl.BlockSpec((KW, TR), lambda t, offs: (0, t),
                             memory_space=pltpu.VMEM),     # member ids
                pl.BlockSpec((K, b, b, TR), lambda t, offs: (0, 0, 0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b, TR), lambda t, offs: (0, t),
                                   memory_space=pltpu.VMEM),
        )
        self._call_cached = pl.pallas_call(
            self._kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, E), dt),
            # raise Mosaic's default 16 MB scoped-VMEM limit to match the
            # class's own budget (the VMEM_BUDGET check above)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=self.VMEM_BUDGET + (16 << 20)),
            interpret=self.interpret,
        )
        return self._call_cached

    def __call__(self, x: jax.Array) -> jax.Array:
        """y = A @ x with x (S, b) -> (E, b) (same contract as BSR.spmv;
        rectangular when src_rows was given)."""
        return self.apply_t(x.T).T

    def apply_t(self, x_t: jax.Array) -> jax.Array:
        """Transposed entry: x_t (b, S) -> y_t (b, E).

        The (N, b) std layout pads its 3-wide minor dimension to a full
        128 lane tile (a 42x physical blow-up for b=3); pipelines that
        keep vectors transposed end to end (ops/agg round 4) call this
        directly and never materialize a std-layout array.
        """
        E, b, G, S = self.E, self.b, self.G, self.S
        # grouped layout (b*G, S/G): sublane (i, c), lane = group index
        xg = x_t.reshape(b, S // G, G).transpose(0, 2, 1).reshape(
            b * G, S // G)
        # the row-tile input only feeds the self-block shortcut (square
        # operators); rectangular ones get a folded zero placeholder
        x_row = x_t if self.self0 else jnp.zeros((b, E), x_t.dtype)
        return self._call()(self.offs, x_row, xg, self.rel_t, self.mem_t,
                            self.vals_t)


def spmv_fast(A: BSR, interpret: bool = False, group: int = 1):
    """Best available SpMV for A: the Pallas kernel when the layout allows
    it (banded, fits VMEM), else the XLA gather path ``A.spmv``."""
    try:
        return PallasSpMV(A, interpret=interpret, group=group)
    except ValueError:
        return A.spmv
