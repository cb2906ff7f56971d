"""Shared skeleton for the few-shot image-classification datasets.

Every reference dataset repeats the same tail (few-shot pkl cache ->
base/new subsample -> DatasetBase init, e.g. oxford_pets.py:33-54);
``FewShotDataset.finalize`` implements it once with cache paths and
semantics identical to the reference.
"""
from __future__ import annotations

import os

from rpo_tpu.data.datum import DatasetBase
from rpo_tpu.data.splits import (
    load_or_create_fewshot,
    mkdir_if_missing,
    subsample_classes,
)


class FewShotDataset(DatasetBase):
    dataset_dir = ""

    def resolve_root(self, cfg) -> str:
        root = os.path.abspath(os.path.expanduser(cfg.DATASET.ROOT))
        self.dataset_dir = os.path.join(root, self.dataset_dir)
        self.split_fewshot_dir = os.path.join(self.dataset_dir, "split_fewshot")
        mkdir_if_missing(self.split_fewshot_dir)
        return self.dataset_dir

    def finalize(self, cfg, train, val, test) -> None:
        train, val = load_or_create_fewshot(
            self, train, val, self.split_fewshot_dir,
            int(cfg.DATASET.NUM_SHOTS), int(cfg.SEED),
        )
        subsample = cfg.DATASET.SUBSAMPLE_CLASSES
        train, val, test = subsample_classes(train, val, test, subsample=subsample)
        super().__init__(train_x=train, val=val, test=test)
