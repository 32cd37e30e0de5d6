from . import geometry, gmsh, splitting, structured, topology
