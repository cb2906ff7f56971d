"""Sweep runner: multiplex independent protocol jobs across workers.

The reference fans out (dataset, seed, shot) jobs sequentially in bash
with one GPU pinned per run (scripts/rpo/base2new_generalization_main.sh).
On TPU, independent jobs map to independent hosts/slices (DCN-level
parallelism, SURVEY.md §2.10); this runner provides:

  - a job matrix (datasets x seeds x shots) for the standard protocols,
  - N local worker processes (or a --shard i/M split across pod hosts),
  - idempotent skip of completed output dirs (log contains the end
    signal), matching the reference scripts' skip behavior,
  - per-job retry and a final summary.

Examples:
  python scripts/sweep.py base2new --trainer RPO --cfg main_K24 \
      --datasets caltech101 dtd --seeds 1 2 3 --shots 16 --workers 1
  python scripts/sweep.py base2new --shard 0/4 ...   # host 0 of 4
"""
from __future__ import annotations

import argparse
import itertools
import os
import glob
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

B2N_DATASETS = [
    "eurosat", "dtd", "fgvc_aircraft", "oxford_flowers", "stanford_cars",
    "oxford_pets", "food101", "sun397", "ucf101", "caltech101", "imagenet",
]


def job_done(output_dir: str, phase: str = "test") -> bool:
    # output dirs are repo-relative (train.py runs with cwd=REPO); anchor
    # there so the check works however sweep.py itself is invoked
    # A reused output dir keeps its first log.txt and each later run
    # writes log.txt-<timestamp> (Dassl logger semantics) — a successful
    # RETRY after a crash therefore lands in a timestamped file, so
    # completion must consider every log, not just log.txt.
    logs = sorted(glob.glob(os.path.join(REPO, output_dir, "log.txt*")))
    if not logs:
        return False
    for log in logs:
        with open(log) as f:
            tail = f.read()
        if phase == "train":
            # per-epoch best_val evaluation prints "=> result" long before
            # the final checkpoint lands — only the end marker proves
            # completion
            if "Finish training" in tail:
                return True
        elif "Finish training" in tail or "=> result" in tail:
            return True
    return False


def make_base2new_jobs(args):
    jobs = []
    for dataset, seed, shot in itertools.product(args.datasets, args.seeds, args.shots):
        common = dict(dataset=dataset, seed=seed, shot=shot)
        train_dir = (
            f"output/{args.trainer.lower()}/base2new/train_base/{dataset}/"
            f"shots_{shot}/{args.trainer}/{args.cfg}/seed{seed}"
        )
        jobs.append(
            {
                **common,
                "phase": "train",
                "output_dir": train_dir,
                "argv": [
                    "--seed", str(seed), "--trainer", args.trainer,
                    "--dataset-config-file", f"configs/datasets/{dataset}.yaml",
                    "--config-file", f"configs/trainers/{args.trainer}/{args.cfg}.yaml",
                    "--output-dir", train_dir,
                    "DATASET.NUM_SHOTS", str(shot),
                    "DATASET.SUBSAMPLE_CLASSES", "base",
                ],
            }
        )
        for sub in ("base", "new"):
            test_dir = (
                f"output/{args.trainer.lower()}/base2new/test_{sub}/{dataset}/"
                f"shots_{shot}/{args.trainer}/{args.cfg}/seed{seed}"
            )
            jobs.append(
                {
                    **common,
                    "phase": f"test_{sub}",
                    "output_dir": test_dir,
                    "train_dir": train_dir,
                    "argv": [
                        "--seed", str(seed), "--trainer", args.trainer,
                        "--dataset-config-file", f"configs/datasets/{dataset}.yaml",
                        "--config-file", f"configs/trainers/{args.trainer}/{args.cfg}.yaml",
                        "--output-dir", test_dir,
                        "--model-dir", train_dir,
                        "--load-epoch", str(args.load_epoch),
                        "--eval-only",
                        "DATASET.NUM_SHOTS", str(shot),
                        "DATASET.SUBSAMPLE_CLASSES", sub,
                    ],
                }
            )
    return jobs


def run_job(job, args) -> bool:
    if job_done(job["output_dir"], job["phase"]):
        print(f"[skip] {job['output_dir']} (already complete)")
        return True
    argv = [sys.executable, "train.py"] + job["argv"]
    if args.root:
        # BEFORE the positional KEY VALUE overrides: train.py's opts use
        # argparse.REMAINDER, which would swallow a trailing --root
        argv[2:2] = ["--root", args.root]
    for attempt in range(args.retries + 1):
        t0 = time.time()
        proc = subprocess.run(argv, cwd=REPO)
        ok = proc.returncode == 0 and job_done(job["output_dir"], job["phase"])
        status = "ok" if ok else f"FAILED rc={proc.returncode}"
        print(f"[{status}] {job['output_dir']} ({time.time() - t0:.0f}s, attempt {attempt + 1})")
        if ok:
            return True
    return False


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("protocol", choices=["base2new"])
    parser.add_argument("--trainer", default="RPO")
    parser.add_argument("--cfg", default="main_K24")
    parser.add_argument("--datasets", nargs="+", default=B2N_DATASETS)
    parser.add_argument("--seeds", nargs="+", type=int, default=[1, 2, 3])
    parser.add_argument("--shots", nargs="+", type=int, default=[16])
    parser.add_argument("--load-epoch", type=int, default=15)
    parser.add_argument("--root", default=os.environ.get("DATA", ""))
    parser.add_argument("--workers", type=int, default=1,
                        help="concurrent jobs on this host (1 per chip/slice)")
    parser.add_argument("--retries", type=int, default=1)
    parser.add_argument("--shard", default="",
                        help="i/M: run only the i-th of M shards of the (dataset,seed,shot) matrix")
    args = parser.parse_args()

    jobs = make_base2new_jobs(args)
    if args.shard:
        i, m = (int(x) for x in args.shard.split("/"))
        keys = sorted({(j["dataset"], j["seed"], j["shot"]) for j in jobs})
        mine = {k for n, k in enumerate(keys) if n % m == i}
        jobs = [j for j in jobs if (j["dataset"], j["seed"], j["shot"]) in mine]

    # phase ordering: train jobs first (tests depend on their checkpoints)
    train_jobs = [j for j in jobs if j["phase"] == "train"]
    test_jobs = [j for j in jobs if j["phase"] != "train"]
    print(f"{len(train_jobs)} train + {len(test_jobs)} test jobs")

    failures = []
    blocked = []
    for phase_idx, batch in enumerate((train_jobs, test_jobs)):
        if phase_idx == 1:
            # a test job whose train run never completed would fail (no
            # checkpoint) or silently evaluate a stale checkpoint left at
            # the same train_dir by a previous sweep — report it blocked
            # instead of launching train.py
            # Completed test jobs stay runnable regardless: run_job skips
            # them, and a re-run over pruned/lost train dirs still exits 0.
            ready = []
            for j in batch:
                if job_done(j["output_dir"], j["phase"]) or job_done(j["train_dir"], "train"):
                    ready.append(j)
                else:
                    print(f"[blocked] {j['output_dir']} (train incomplete: {j['train_dir']})")
                    blocked.append(j["output_dir"])
            batch = ready
        with ThreadPoolExecutor(max_workers=args.workers) as pool:
            for job, ok in zip(batch, pool.map(lambda j: run_job(j, args), batch)):
                if not ok:
                    failures.append(job["output_dir"])
    n_bad = len(failures) + len(blocked)
    print(f"sweep complete: {len(jobs) - n_bad}/{len(jobs)} ok")
    if blocked:
        print("blocked test jobs (train incomplete):")
        for b in blocked:
            print(" ", b)
    if failures:
        print("failed jobs:")
        for f in failures:
            print(" ", f)
    if failures or blocked:
        sys.exit(1)


if __name__ == "__main__":
    main()
