"""CLI entry point — flag-compatible with the reference train.py
(/root/reference/train.py:174-227).  The implementation lives in
rpo_tpu/cli.py so the installed wheel exposes the same CLI as the
`rpo-tpu-train` console script.

    python train.py --root $DATA --seed 1 --trainer RPO \
        --dataset-config-file configs/datasets/caltech101.yaml \
        --config-file configs/trainers/RPO/main_K24.yaml \
        --output-dir output/... DATASET.NUM_SHOTS 16 DATASET.SUBSAMPLE_CLASSES base
"""
from rpo_tpu.cli import cli_main

if __name__ == "__main__":
    cli_main()
