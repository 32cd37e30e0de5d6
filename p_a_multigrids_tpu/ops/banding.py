"""Aligned band windows for the in-kernel dynamic slices.

The banded Pallas kernels (ops/pallas_stencil, ops/pallas_bsr) slice a
window ``[off_t, off_t + W)`` out of a VMEM-resident axis of length
``total`` and promise Mosaic that ``off_t`` is a multiple of ``align``
(``pl.multiple_of``).  A naive clamp ``off = min(off, total - W)`` breaks
that promise whenever ``total`` is not itself a multiple of ``align`` — a
false compiler hint that can miscompile the slice.  This helper keeps every
offset aligned by construction and instead widens ``W`` until the aligned
offsets cover all requested ``[lo, hi]`` ranges.
"""

from __future__ import annotations

import numpy as np


def aligned_band(lo: np.ndarray, hi: np.ndarray, total: int,
                 align: int, wstep: int = 128,
                 wmin: int = 0) -> tuple[int, np.ndarray]:
    """Width + per-tile aligned offsets covering ``[lo_t, hi_t]`` per tile.

    Args:
      lo, hi: (T,) inclusive index ranges each tile must see
      total:  axis length (offsets satisfy ``off + W <= max(total, W)``)
      align:  required offset alignment
      wstep:  W granularity (the lane tile: 128)
      wmin:   lower bound on W (distributed kernels unify the band width
              across per-device tables so one static kernel serves all)

    Returns:
      (W, offs) with ``offs % align == 0`` everywhere, ``offs >= 0``,
      ``offs <= lo`` and ``offs + W > hi`` elementwise.  When the axis is
      shorter than one window, W covers the whole axis (offs = 0).
    """
    lo = np.asarray(lo, np.int64)
    hi = np.asarray(hi, np.int64)
    if wmin >= total:
        return total, np.zeros_like(lo, np.int64)
    if hi.size == 0 or int(hi.max()) < 0:
        return max(min(wstep, max(total, 1)), wmin), \
            np.zeros_like(lo, np.int64)
    offs = (lo // align) * align
    span = int((hi - offs).max()) + 1
    W = max(-(-span // wstep) * wstep, wmin)
    if W >= total:
        return total, np.zeros_like(offs)
    # pull offsets back (in aligned steps) so the window stays inside the
    # axis; compensate by widening W until every [lo, hi] is still covered
    while True:
        max_off = ((total - W) // align) * align
        eff = np.minimum(offs, max_off)
        if int((hi - eff).max()) < W:
            return W, eff
        W += wstep
        if W >= total:
            return total, np.zeros_like(offs)
