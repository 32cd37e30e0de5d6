from . import curves, vtu
