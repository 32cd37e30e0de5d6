"""gmsh 2.2 ASCII reader.

Feature parity with the reference's ``ReadMSH`` (/root/reference/
Msh2Tri.F90:132-334): parses ``$Nodes`` / ``$Elements``, keeps the triangle
element types {2, 9, 20, 21, 23, 24, 25} (only corner vertices), records the
first tag as ``region_id``.  Unlike the reference this is a setup-time-only
path and the neighbor search lives in :mod:`p_a_multigrids_tpu.mesh.topology`
as an O(E) hash instead of the O(E^2) all-pairs ``CheckNeig`` that dominated
the reference's runtime (grofiling.txt: 96.6%% of a full run).
"""

from __future__ import annotations

import dataclasses

import numpy as np

# gmsh element types whose first three nodes are triangle corners
_TRI_TYPES = {2, 9, 20, 21, 23, 24, 25}


@dataclasses.dataclass
class RawGmsh:
    vertices: np.ndarray        # (nnodes, 3) float64
    triangles: np.ndarray       # (E, 3) int32, 0-based vertex ids
    region_id: np.ndarray       # (E,) int32


def read_msh(path: str) -> RawGmsh:
    """Parse a gmsh 2.x ASCII file, preferring the native C++ loader
    (native/gmsh_reader.cpp — the counterpart of the reference's compiled
    ReadMSH) with this Python implementation as fallback and cross-check."""
    try:
        from ..utils import native
        if native.available():
            v, t, r = native.read_msh(path)
            return RawGmsh(vertices=v, triangles=t, region_id=r)
    except Exception:
        # the Python parser defines the contract: a file the stricter C++
        # scanner rejects (e.g. trailing whitespace on a section tag) must
        # still load if the Python implementation accepts it.  Only if BOTH
        # reject does the error propagate (from the Python side, below).
        pass
    return _read_msh_py(path)


def _read_msh_py(path: str) -> RawGmsh:
    with open(path) as f:
        lines = f.read().split("\n")
    i = 0

    def seek(tag: str) -> int:
        nonlocal i
        while i < len(lines) and lines[i].strip() != tag:
            i += 1
        if i == len(lines):
            raise ValueError(f"{path}: section {tag} not found")
        i += 1
        return i

    seek("$MeshFormat")
    parts = lines[i].split()
    version = float(parts[0])
    if not (2.0 <= version <= 2.2):
        raise ValueError(f"{path}: unsupported gmsh version {version}; "
                         "only 2.x ASCII is supported (Msh2Tri.F90:179-186)")
    if int(parts[1]) != 0:
        raise ValueError(f"{path}: binary .msh not supported")

    seek("$Nodes")
    nnodes = int(lines[i])
    i += 1
    vertices = np.zeros((nnodes, 3), np.float64)
    for k in range(nnodes):
        parts = lines[i + k].split()
        idx = int(parts[0]) - 1
        vertices[idx] = [float(parts[1]), float(parts[2]), float(parts[3])]
    i += nnodes

    seek("$Elements")
    nelems = int(lines[i])
    i += 1
    tris = []
    regions = []
    for k in range(nelems):
        parts = lines[i + k].split()
        etype = int(parts[1])
        if etype not in _TRI_TYPES:
            continue
        ntags = int(parts[2])
        regions.append(int(parts[3]) if ntags >= 1 else 0)
        base = 3 + ntags
        tris.append([int(parts[base]), int(parts[base + 1]),
                     int(parts[base + 2])])
    triangles = np.asarray(tris, np.int32).reshape(-1, 3) - 1
    # node-id validation (the native scanner's check, duplicated here so a
    # corrupt file still fails loudly after the Python fallback: id 0 would
    # otherwise wrap to the last vertex as index -1)
    if len(triangles) and (triangles.min() < 0
                           or triangles.max() >= nnodes):
        raise ValueError(f"{path}: triangle node id out of range "
                         f"1..{nnodes}")
    region_id = np.asarray(regions, np.int32)
    return RawGmsh(vertices=vertices, triangles=triangles, region_id=region_id)
