"""DataManager: dataset construction + train/test loaders.

Equivalent role to Dassl's DataManager inside TrainerX (SURVEY.md §2.9):
resolves cfg.DATASET.NAME in the registry, builds transform pipelines
from cfg.INPUT, and exposes loaders + class metadata to trainers.
"""
from __future__ import annotations

import jax

from rpo_tpu.engine.registry import DATASET_REGISTRY
from rpo_tpu.parallel.dp import pad_multiple

from .loader import BatchLoader
from .transforms import TransformPipeline


class DataManager:
    def __init__(self, cfg):
        self.cfg = cfg
        dataset_cls = DATASET_REGISTRY.get(cfg.DATASET.NAME)
        self.dataset = dataset_cls(cfg)
        transform = TransformPipeline(cfg.INPUT)
        self.transform = transform

        num_workers = int(cfg.DATALOADER.NUM_WORKERS)
        # Padded batch shapes must divide over the DATA axis of the mesh
        # (device_count/tp when TRAIN.TENSOR_PARALLEL splits the rest
        # over the model axis).
        from rpo_tpu.parallel.tp import data_axis_size

        n_dev = data_axis_size(cfg)
        train_bs = int(cfg.DATALOADER.TRAIN_X.BATCH_SIZE)
        test_bs = int(cfg.DATALOADER.TEST.BATCH_SIZE)
        self.train_loader_x = BatchLoader(
            self.dataset.train_x,
            transform,
            batch_size=train_bs,
            train=True,
            shuffle=True,
            num_workers=num_workers,
            pad_to=pad_multiple(train_bs, n_dev),
            drop_last=True,  # Dassl train-loader semantics
        )
        self.val_loader = (
            BatchLoader(
                self.dataset.val,
                transform,
                batch_size=test_bs,
                train=False,
                shuffle=False,
                num_workers=num_workers,
                pad_to=pad_multiple(test_bs, n_dev),
            )
            if self.dataset.val
            else None
        )
        self.test_loader = BatchLoader(
            self.dataset.test,
            transform,
            batch_size=test_bs,
            train=False,
            shuffle=False,
            num_workers=num_workers,
            pad_to=pad_multiple(test_bs, n_dev),
        )

    @property
    def num_classes(self) -> int:
        return self.dataset.num_classes

    @property
    def classnames(self):
        return self.dataset.classnames

    def show_dataset_summary(self) -> None:
        cfg = self.cfg
        print("***** Dataset statistics *****")
        print(f"  Dataset: {cfg.DATASET.NAME}")
        print(f"  # classes: {self.num_classes:,}")
        print(f"  # train_x: {len(self.dataset.train_x):,}")
        if self.dataset.val:
            print(f"  # val: {len(self.dataset.val):,}")
        print(f"  # test: {len(self.dataset.test):,}")
