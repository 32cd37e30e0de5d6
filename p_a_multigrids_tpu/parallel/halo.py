"""Halo exchange plan: the distributed form of the flat neighbor gather.

The reference's serial halo machinery (``update_overlaps`` writing
boundary-strip DOFs into neighbors' ``t_overlap`` buffers,
/root/reference/splitting.F90:1210-1398) becomes, on a device mesh:

  1. each device packs the face-strip elements that any other device reads
     (its *export buffer* — the analog of the reference's per-face strips),
  2. one ``all_gather`` moves every export buffer over the ICI,
  3. a static (device, slot) gather scatters received values into the same
     (U_loc, C, 3, ...) layout the single-device ``flat_gather`` produces.

All indices are computed once at setup; the runtime cost is one collective
whose payload is the union of partition-boundary strips (O(sqrt N) per
device for 2-D meshes).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class HaloPlan:
    """Per-device static tables, stacked on a leading device axis."""
    export_idx: np.ndarray   # (D, S) int32: local-flat indices to export
    is_remote: np.ndarray    # (D, U_loc, C, 3) bool
    local_idx: np.ndarray    # (D, U_loc, C, 3) int32 into local flat
    src_dev: np.ndarray      # (D, U_loc, C, 3) int32
    src_slot: np.ndarray     # (D, U_loc, C, 3) int32
    n_devices: int
    slots: int               # S


def build_halo_plan(neigh_elem: np.ndarray, n_devices: int) -> HaloPlan:
    """Build the exchange plan from the global flat neighbor table.

    Args:
      neigh_elem: (U, C, 3) global flat indices (u*C+c), -1 = boundary
      n_devices: number of contiguous equal blocks over the macro axis
    """
    U, C, nface = neigh_elem.shape
    assert U % n_devices == 0, "partition the mesh to equal blocks first"
    U_loc = U // n_devices
    block = U_loc * C

    owner = np.where(neigh_elem >= 0, neigh_elem // block, -1)

    # exports[o] = sorted global flats owned by o that any other device reads
    exports: list[set] = [set() for _ in range(n_devices)]
    for d in range(n_devices):
        blk = neigh_elem[d * U_loc:(d + 1) * U_loc]
        own = owner[d * U_loc:(d + 1) * U_loc]
        remote = blk[(own >= 0) & (own != d)]
        for g in np.unique(remote):
            exports[int(g) // block].add(int(g))
    export_lists = [sorted(s) for s in exports]
    S = max(1, max(len(s) for s in export_lists))
    export_idx = np.zeros((n_devices, S), np.int32)
    slot_of: dict[int, tuple[int, int]] = {}
    for o, lst in enumerate(export_lists):
        for slot, g in enumerate(lst):
            export_idx[o, slot] = g - o * block          # local flat index
            slot_of[g] = (o, slot)

    is_remote = np.zeros((n_devices, U_loc, C, 3), bool)
    local_idx = np.zeros((n_devices, U_loc, C, 3), np.int32)
    src_dev = np.zeros((n_devices, U_loc, C, 3), np.int32)
    src_slot = np.zeros((n_devices, U_loc, C, 3), np.int32)
    self_flat = (np.arange(U_loc * C, dtype=np.int32)
                 .reshape(U_loc, C, 1))
    for d in range(n_devices):
        blk = neigh_elem[d * U_loc:(d + 1) * U_loc]      # (U_loc, C, 3)
        own = owner[d * U_loc:(d + 1) * U_loc]
        lidx = np.where(own == d, blk - d * block, 0).astype(np.int32)
        lidx = np.where(blk < 0, self_flat, lidx)        # boundary -> self
        rem = (own >= 0) & (own != d)
        is_remote[d] = rem
        local_idx[d] = np.where(rem, 0, lidx)
        for (u, c, f) in zip(*np.nonzero(rem)):
            o, slot = slot_of[int(blk[u, c, f])]
            src_dev[d, u, c, f] = o
            src_slot[d, u, c, f] = slot
    return HaloPlan(export_idx=export_idx, is_remote=is_remote,
                    local_idx=local_idx, src_dev=src_dev, src_slot=src_slot,
                    n_devices=n_devices, slots=S)


def make_gather(plan_tables: dict, axis_name: str):
    """Shard-local gather with the flat_gather contract.

    plan_tables holds THIS device's slices (export_idx (S,), is_remote /
    local_idx / src_dev / src_slot (U_loc, C, 3)).  Returns
    gather(L, X): (U_loc, C, D...) -> (U_loc, C, 3, D...).
    """
    def gather(L, X):
        U_loc, C = X.shape[:2]
        trail = X.shape[2:]
        flat = X.reshape(U_loc * C, *trail)
        exports = flat[plan_tables["export_idx"]]        # (S, ...)
        gathered = jax.lax.all_gather(exports, axis_name)  # (D, S, ...)
        remote = gathered[plan_tables["src_dev"],
                          plan_tables["src_slot"]]       # (U_loc, C, 3, ...)
        local = flat[plan_tables["local_idx"]]
        mask = plan_tables["is_remote"]
        mask = mask.reshape(mask.shape + (1,) * len(trail))
        return jnp.where(mask, remote, local)

    return gather
