from . import bsr, local_matrices, smoothers
