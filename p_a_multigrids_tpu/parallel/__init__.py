from . import halo, partition, solver
