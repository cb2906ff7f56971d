"""Standalone on-device Pallas kernel self-test CLI (VERDICT r3 #3).

Thin wrapper over ``rpo_tpu.ops.selftest.run_selftest`` — every Pallas
kernel at every production shape vs the plain-XLA path, each check fully
isolated with one retry.  Prints ONE JSON line; exit 0 iff all pass, but
it NEVER dies on the first fault: run this first whenever a bench gate
dies to bisect a kernel regression from an `axon` platform fault
(round 3's BENCH_r03.json crash mode).

    python tools/kernel_selftest.py [--tol 2e-2] [--retries 1] [--quiet]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--tol", type=float, default=2e-2)
    p.add_argument("--retries", type=int, default=1)
    p.add_argument("--quiet", action="store_true")
    args = p.parse_args()

    import jax

    # the JAX_PLATFORMS env var is ignored under the force-registered
    # axon TPU platform (CLAUDE.md); pin via config like train.py does
    if os.environ.get("RPO_TPU_FORCE_CPU") or os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # persistent compile cache: reruns of the same checks skip the ~3 min
    # of Mosaic/XLA compiles (same setup as bench.py)
    cache = os.environ.get(
        "RPO_TPU_XLA_CACHE", os.path.expanduser("~/.cache/rpo_tpu/xla")
    )
    if cache and cache != "0":
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    if jax.default_backend() == "cpu":
        # interpret-mode coverage lives in tests/test_pallas_attention.py;
        # this tool certifies the compiled Mosaic kernels on silicon
        print(json.dumps({
            "metric": "kernel_selftest", "value": 0, "unit": "checks",
            "total": 0, "checks": {}, "backend": "cpu",
            "note": "skipped: no TPU backend (compiled-kernel test only)",
        }))
        return 0

    from rpo_tpu.ops.selftest import run_selftest

    out = run_selftest(args.tol, args.retries, verbose=not args.quiet)
    print(json.dumps(out))
    return 0 if out["value"] == out["total"] else 1


if __name__ == "__main__":
    sys.exit(main())
