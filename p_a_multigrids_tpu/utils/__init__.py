from . import quadrature, shape_functions
