"""Macro-element partitioning for multi-device runs.

The reference sketches exactly this decomposition — triangle -> processor
(``getProcessor``, /root/reference/Generic.F90:387-405, a stub) with
per-macro-face halo buffers — but never runs it.  Here a BFS ordering over
the macro adjacency graph yields locality-preserving contiguous blocks,
one per device, so cross-device faces (the halo traffic) are minimized and
ownership is computable as ``element // block_size``.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..mesh.topology import MacroMesh


def bfs_order(neig: np.ndarray) -> np.ndarray:
    """Breadth-first ordering of the macro adjacency graph (all components).

    Returns order (U,) such that order[k] is the k-th element visited.
    """
    U = neig.shape[0]
    visited = np.zeros(U, bool)
    order = np.empty(U, np.int64)
    pos = 0
    for seed in range(U):
        if visited[seed]:
            continue
        queue = [seed]
        visited[seed] = True
        while queue:
            e = queue.pop(0)
            order[pos] = e
            pos += 1
            for f in range(3):
                n = neig[e, f]
                if n >= 0 and not visited[n]:
                    visited[n] = True
                    queue.append(n)
    assert pos == U
    return order


def permute_mesh(mesh: MacroMesh, order: np.ndarray) -> MacroMesh:
    """Relabel elements so element k is old element order[k]."""
    U = mesh.num_elements
    inv = np.empty(U, np.int64)
    inv[order] = np.arange(U)
    neig = mesh.neig[order]
    neig = np.where(neig >= 0, inv[np.maximum(neig, 0)], -1).astype(np.int32)
    return MacroMesh(
        X=mesh.X[order], tri=mesh.tri[order], neig=neig,
        neigh_face=mesh.neigh_face[order], dir_flag=mesh.dir_flag[order],
        region_id=mesh.region_id[order])


def pad_mesh(mesh: MacroMesh, multiple: int) -> tuple[MacroMesh, int]:
    """Append isolated dummy elements until U is a multiple of `multiple`.

    Dummies are translated copies of element 0 placed far outside the
    domain with no neighbors; they solve their own decoupled (Dirichlet-0)
    systems and never touch real elements.  Returns (padded mesh,
    n_active).
    """
    U = mesh.num_elements
    pad = (-U) % multiple
    if pad == 0:
        return mesh, U
    span = np.abs(mesh.X).max() + 1.0
    Xp = [mesh.X]
    for i in range(pad):
        Xi = mesh.X[0:1].copy()
        Xi[:, 0, :] += 17.0 * span * (i + 1)
        Xp.append(Xi)
    X = np.concatenate(Xp, axis=0)
    neig = np.concatenate([mesh.neig, np.full((pad, 3), -1, np.int32)])
    nf = np.concatenate([mesh.neigh_face, np.full((pad, 3), -1, np.int32)])
    df = np.concatenate([mesh.dir_flag, np.zeros((pad, 3), bool)])
    tri = np.concatenate([mesh.tri, np.full((pad, 3), -1, np.int32)])
    rid = np.concatenate([mesh.region_id, np.zeros(pad, np.int32)])
    return MacroMesh(X=X, tri=tri, neig=neig, neigh_face=nf, dir_flag=df,
                     region_id=rid), U


@dataclasses.dataclass
class Partitioned:
    mesh: MacroMesh
    n_active: int
    n_parts: int

    @property
    def block(self) -> int:
        return self.mesh.num_elements // self.n_parts


def partition_mesh(mesh: MacroMesh, n_parts: int) -> Partitioned:
    """BFS-order, then pad to equal contiguous blocks per device."""
    mesh = permute_mesh(mesh, bfs_order(mesh.neig))
    mesh, n_active = pad_mesh(mesh, n_parts)
    return Partitioned(mesh=mesh, n_active=n_active, n_parts=n_parts)


def cut_fraction(mesh: MacroMesh, n_parts: int) -> float:
    """Fraction of interior macro faces crossing a partition boundary."""
    U = mesh.num_elements
    block = U // n_parts
    own = np.arange(U) // block
    e, f = np.nonzero(mesh.neig >= 0)
    other = own[mesh.neig[e, f]]
    return float((own[e] != other).mean())
