"""Per-chip fast-path retention of the distributed solver (real TPU).

The blueprint's >= 80% scaling target is about per-chip throughput
retention under sharding (VERDICT r3 weak #6).  Multi-chip hardware is not
reachable from this environment, so the honest measurable number is D=1:
the shard_map wrapping cost of the distributed machinery on one real
chip, compared with the serial solver on the same mesh.

READ THE D=1 CAVEATS before quoting the ratio (VERDICT r4 weak #1 /
ADVICE r4): at D=1 the extended domains are disabled (He=0 — there are no
ghost rows to smooth) and the SA correction short-circuits to the serial
fast path (`_agg_correct`'s D==1 branch), so retention ~1.0 here measures
that sharding adds no overhead ON TOP of the serial path — it does NOT
exercise ring exchanges, ghost redundancy, or the psum-restricted agg
machinery.  Those are measured at D=8 on the virtual mesh by
scripts/bench_dist8.py (DIST_BENCH_r05.json), and this script prints the
D=8 ghost-overhead MODEL (per-level W, He, redundant fraction under the
chunked policy) so the real-chip artifact carries it.

Writes DIST_BENCH_TPU.json and prints it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import numpy as np


def ghost_model_at(s, cfg, D: int):
    """Per-level ghost-overhead model the D=1 run cannot measure: what
    W/He/chunk/redundant_frac the solver WOULD use at D devices (same
    formulas as DistributedStencilSolver._build_phases, computed from the
    already-built serial twin's level tables)."""
    U = s._stencil[0].U
    U_loc = -(-U // D)
    out = []
    for li, op in enumerate(s._stencil):
        hs = np.asarray(op._data.halo_src)
        if hs.size == 0:
            continue
        src_u = hs // op.C
        W = int(np.abs(src_u - np.arange(op.U)[:, None]).max())
        R = len(s._phase_coefs(li, cfg.n_smooth))
        if li == len(s._stencil) - 1 and len(s._stencil) > 1:
            R = max(R, len(s._phase_coefs(li, cfg.coarse_sweeps)))
        cap = cfg.dist_ghost_max_frac * U_loc
        ks = [k for k in range(1, R + 1) if 2 * (k + 1) * W <= cap]
        chunk = max(ks) if ks else 1
        He = min((chunk + 1) * W, U)
        He_mid = min(chunk * W, U)
        # round-averaged redundancy: non-final chunks run the x-only
        # He_mid geometry, the final chunk the (chunk+1)*W one (mirror
        # of ghost_report)
        n_mid = max(R - chunk, 0) if chunk < R else 0
        avg = 2 * (n_mid * He_mid + (R - n_mid) * He) / max(R, 1) / U_loc
        out.append(dict(level=li, W=W, rounds=R, chunk=chunk, He=He,
                        He_mid=He_mid, U_loc=U_loc,
                        redundant_frac=round(avg, 4),
                        deep_ghost_frac=round(2 * min((R + 1) * W, U)
                                              / U_loc, 4)))
    return out


def timed_scan(step, x0, n=50, reps=3):
    import jax
    fn = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (step(c), None), x, None, length=n)[0])
    jax.block_until_ready(fn(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(x0))
        best = min(best, time.time() - t0)
    return best / n


def main():
    import jax

    from p_a_multigrids_tpu.config import SemiConfig
    from p_a_multigrids_tpu.mesh import topology
    from p_a_multigrids_tpu.ops import fused as _fused
    from p_a_multigrids_tpu.parallel.stencil_solver import (
        DistributedStencilSolver)

    mesh = topology.from_msh(
        "/root/reference/Mesh_files/untitled8192.msh")
    out = {"n_devices": 1, "configs": {}}
    for name, kw in [
            ("geometric", dict(n_split=2, multi_levels=2,
                               coarse_agg=False)),
            ("production_amg", dict(n_split=2, multi_levels=1, amg=True,
                                    agg_strength=0.5, cheb_degree=16,
                                    cheb_lower=0.05)),
    ]:
        cfg = SemiConfig(dt=0.05, ntime=1, n_multigrid=1, dtype="float32",
                         **kw)
        t0 = time.time()
        dist = DistributedStencilSolver(
            topology.rcm_reorder(mesh), cfg, devices=jax.devices()[:1])
        setup_s = time.time() - t0
        print(f"[{name}] setup {setup_s:.1f}s", file=sys.stderr)

        serial = dist.serial
        T_t = _fused.to_t(serial.initial_condition())
        b_t = serial._rhs_t(T_t)
        ser = timed_scan(lambda x: serial._vcycle_t(0, x, b_t), T_t)
        print(f"[{name}] serial {ser*1e3:.3f} ms/cycle", file=sys.stderr)

        tabs = (tuple(dist.tabs_dev), tuple(dist.ptabs_dev),
                dist.atabs_dev)
        from jax.sharding import NamedSharding, PartitionSpec as P

        # one distributed V-cycle per step (b := current x is fine for a
        # pure timing run; the arithmetic per cycle is identical)
        fn = jax.jit(jax.shard_map(
            lambda x, at: dist._vcycle(at[0], at[1], at[2], 0, x, x),
            mesh=dist.jmesh,
            in_specs=(P(None, None, "dp"),
                      (tuple(dist.specs), dist._phase_specs(),
                       dist._aspecs)),
            out_specs=P(None, None, "dp"), check_vma=False))
        x0 = jax.device_put(np.asarray(T_t),
                            NamedSharding(dist.jmesh, P(None, None, "dp")))
        dst = timed_scan(lambda x: fn(x, tabs), x0)
        print(f"[{name}] distributed {dst*1e3:.3f} ms/cycle",
              file=sys.stderr)
        out["configs"][name] = {
            "serial_ms_per_cycle": round(ser * 1e3, 3),
            "dist_ms_per_cycle": round(dst * 1e3, 3),
            "retention_factor": round(dst / ser, 3),
            "pallas_phase_dist": dist._phases is not None,
            # honesty flags (ADVICE r4): at D=1 the ghost zones are empty
            # and the SA correction short-circuits to the serial path —
            # see the module docstring; D>1 machinery is measured in
            # DIST_BENCH_r05.json
            "amg_tables_built": dist.atabs_dev is not None,
            "d1_serial_agg_shortcircuit": dist.D == 1,
            "d1_ghost_zones_empty": all(
                (g is None or g["He"] == 0)
                for g in dist.ghost_report()) if dist._phases else True,
            # what the ghosts WOULD cost at D=8 (chunked vs deep policy)
            "ghost_model_at_D8": ghost_model_at(dist.serial, cfg, 8),
        }
    with open("DIST_BENCH_TPU.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
