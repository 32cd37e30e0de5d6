"""Profiling / observability helpers.

The reference's tracing story is manual CPU_TIME bracketing plus committed
gprof/callgrind artifacts (SURVEY.md section 5).  Here:

- ``timed``: wall-clock bracketing with device synchronization (the
  CPU_TIME equivalent that is actually correct under async dispatch);
- ``trace``: context manager around ``jax.profiler`` emitting a TensorBoard
  trace directory for per-kernel analysis;
- ``roofline``: quick arithmetic-intensity bookkeeping for an operator
  application, used by bench.py to report achieved vs light-speed
  bandwidth.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax


@dataclasses.dataclass
class Timing:
    name: str
    seconds: float
    iterations: int

    @property
    def per_iter_ms(self) -> float:
        return self.seconds / self.iterations * 1e3

    def __str__(self):
        return f"{self.name}: {self.per_iter_ms:.3f} ms/iter"


def timed(name: str, fn, *args, iterations: int = 20, warmup: int = 2
          ) -> Timing:
    """Time a jitted callable with proper device synchronization."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iterations):
        out = fn(*args)
    jax.block_until_ready(out)
    return Timing(name=name, seconds=time.time() - t0,
                  iterations=iterations)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/pam_trace"):
    """jax.profiler trace around a block (view with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class Roofline:
    flops: float
    bytes_moved: float
    seconds: float

    @property
    def achieved_gflops(self) -> float:
        return self.flops / self.seconds / 1e9

    @property
    def achieved_gbps(self) -> float:
        return self.bytes_moved / self.seconds / 1e9

    def summary(self, peak_gbps: float = 800.0) -> str:
        return (f"{self.achieved_gflops:.1f} GFLOP/s, "
                f"{self.achieved_gbps:.1f} GB/s "
                f"({100 * self.achieved_gbps / peak_gbps:.1f}% of "
                f"{peak_gbps:.0f} GB/s peak)")


def operator_roofline(U: int, C: int, nloc: int, seconds: float,
                      dtype_bytes: int = 4) -> Roofline:
    """Roofline for one block-STENCIL operator application (ops/stencil):
    the dominant traffic is the per-element coefficient blocks (self + 3
    faces, nloc x nloc each) streamed from HBM; state in/out is tiny.
    Reported by bench.py as op_achieved_gbps."""
    E = U * C
    nnz = E * 4 * nloc * nloc
    flops = 2.0 * nnz
    bytes_moved = dtype_bytes * (nnz + 3 * E * nloc)
    return Roofline(flops=flops, bytes_moved=bytes_moved, seconds=seconds)
