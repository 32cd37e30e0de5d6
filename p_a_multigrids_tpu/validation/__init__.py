from . import analytical, gates, probe
