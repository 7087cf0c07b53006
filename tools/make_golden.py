"""Generate a bundled golden front with the exact f64 numpy oracle.

Offline tool (CPU-pinned; safe to run alongside a TPU process).  Generates
the named instance with the same seed policy as bench_scale.py (seed=1),
bundles it under examples/, solves it with the ``numpy`` oracle backend —
the repo's exact-f64 ground truth (CLAUDE.md invariants) — and writes the
golden ``examples/<name>.out`` through the byte-compatible writer.

Usage:
    python tools/make_golden.py KP2D100 [--workers 1] [--no-bundle-lp]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

# JAX_PLATFORMS env is ignored under the axon plugin; pin via config before
# any other jax use so this process never touches the TPU tunnel.
jax.config.update("jax_platforms", "cpu")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--workers", type=int, default=1)
    ap.add_argument("--no-bundle-lp", action="store_true")
    args = ap.parse_args()

    from bench_scale import instance_path

    from moip_aira_tpu.api import solve_front
    from moip_aira_tpu.io import read_problem
    from moip_aira_tpu.io.writer import write_out

    lp = instance_path(args.name)
    bundled_lp = os.path.join(REPO, "examples", f"{args.name}.lp")
    if not args.no_bundle_lp and os.path.abspath(lp) != os.path.abspath(bundled_lp):
        with open(lp) as src, open(bundled_lp, "w") as dst:
            dst.write(src.read())
        lp = bundled_lp

    p = read_problem(lp)
    print(f"[make_golden] {args.name}: n={p.n} rows={p.A.shape[0]} "
          f"objcnt={p.objcnt}", flush=True)
    t0 = time.monotonic()
    res = solve_front(p, n_workers=args.workers, backend="numpy")
    dt = time.monotonic() - t0
    from moip_aira_tpu import __version__

    out = os.path.join(REPO, "examples", f"{args.name}.out")
    with open(out, "w") as fh:
        write_out(fh, res, f"moip-aira-tpu {__version__} (numpy oracle)")
    print(f"[make_golden] {args.name}: {res.solution_count} points, "
          f"{res.ip_count} IPs, {dt:.1f}s -> {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
