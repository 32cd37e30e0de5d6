"""Checkpoint / resume for long transport runs.

The reference persists nothing restartable (SURVEY.md section 5: only the
VTU time series).  Here solver state (the tracer field, step counter, and
the config needed to validate compatibility) round-trips through a single
.npz file; time loops can resume exactly.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np


def save(path: str, T, step: int, cfg=None, extra: dict | None = None
         ) -> None:
    meta = {"step": int(step)}
    if cfg is not None:
        meta["cfg"] = {
            k: (v if isinstance(v, (int, float, str, bool, list, tuple))
                else str(v))
            for k, v in dataclasses.asdict(cfg).items()}
    np.savez(path, T=np.asarray(T), meta=json.dumps(meta),
             **(extra or {}))


def load(path: str):
    """Returns (T, step, meta_dict, extras)."""
    with np.load(path, allow_pickle=False) as z:
        T = z["T"]
        meta = json.loads(str(z["meta"]))
        extras = {k: z[k] for k in z.files if k not in ("T", "meta")}
    return T, meta["step"], meta, extras


def run_with_checkpoints(solver, T, ntime: int, path: str,
                         every: int = 10, start_step: int = 0):
    """Time-step with periodic checkpointing; resumable via load()."""
    for step in range(start_step, ntime):
        T = solver._step(T)
        if (step + 1) % every == 0 or step + 1 == ntime:
            save(path, T, step + 1, solver.cfg)
    return T
