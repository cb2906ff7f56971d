"""ImageNet — train on the train folder, evaluate on the val folder.

Behavior contract (/root/reference/datasets/imagenet.py): the on-disk
formats are pinned — ``preprocessed.pkl`` memoizes the full item lists
under keys {train, test}; the few-shot cache lives at
``split_fewshot/shot_{N}-seed_{S}.pkl`` with a TRAIN-ONLY payload (no
few-shot val exists); ``classnames.txt`` lines are
``<wnid> <classname words...>``; and the val folder doubles as both val
and test.  Unlike the reference, the few-shot/subsample tail is the
shared machinery in splits.py rather than inline code.
"""
from __future__ import annotations

import os
from collections import OrderedDict

from rpo_tpu.data.datum import Datum, DatasetBase
from rpo_tpu.data.splits import (
    listdir_nohidden,
    load_or_create_fewshot,
    subsample_classes,
)
from rpo_tpu.engine.registry import DATASET_REGISTRY

from .common import FewShotDataset


@DATASET_REGISTRY.register()
class ImageNet(FewShotDataset):
    dataset_dir = "imagenet"

    def __init__(self, cfg):
        dataset_dir = self.resolve_root(cfg)
        self.image_dir = os.path.join(dataset_dir, "images")

        train, test = self._item_lists(dataset_dir)
        train, _ = load_or_create_fewshot(
            self, train, None, self.split_fewshot_dir,
            int(cfg.DATASET.NUM_SHOTS), int(cfg.SEED),
        )
        train, test = subsample_classes(
            train, test, subsample=cfg.DATASET.SUBSAMPLE_CLASSES
        )
        # the val split IS the test split (imagenet.py:61)
        DatasetBase.__init__(self, train_x=train, val=test, test=test)

    def _item_lists(self, dataset_dir: str):
        """Full (train, test) Datum lists, memoized in preprocessed.pkl —
        enumerating the 1.28M-image tree is the expensive part."""
        cache = os.path.join(dataset_dir, "preprocessed.pkl")
        # fallback cache name for when preprocessed.pkl exists but can't be
        # loaded here (foreign dassl cache): a rescan is persisted under a
        # framework-specific name so the 1.28M-image enumeration is paid once
        cache_rpo = os.path.join(dataset_dir, "preprocessed_rpo_tpu.pkl")
        from rpo_tpu.data.interop import dump_datum_pickle, load_datum_pickle

        for cand in (cache, cache_rpo):
            if os.path.exists(cand):
                try:
                    with open(cand, "rb") as f:
                        data = load_datum_pickle(f)  # Dassl caches load too
                    return data["train"], data["test"]
                except Exception as exc:
                    # a truncated file from a killed writer, or a foreign
                    # format interop.py doesn't cover — regenerate, keep the
                    # broken file intact (same policy as splits.py)
                    print(
                        f"(!) Could not load {cand} ({exc}); rescanning the "
                        "image tree without overwriting"
                    )
        wnid_to_name = self.read_classnames(
            os.path.join(dataset_dir, "classnames.txt")
        )
        train = self._scan_split("train", wnid_to_name)
        # standard practice: report accuracy on the val images
        test = self._scan_split("val", wnid_to_name)
        # persist to the shared name if free, else the framework-specific
        # one (never clobber a foreign cache; never re-enumerate forever)
        dest = cache if not os.path.exists(cache) else cache_rpo
        tmp = f"{dest}.tmp.{os.getpid()}"
        try:
            with open(tmp, "wb") as f:  # write-then-rename: no
                # truncated cache from a killed job; Dassl-format pickle so
                # a reference run on this root can load it (interop.py)
                dump_datum_pickle({"train": train, "test": test}, f)
            os.replace(tmp, dest)
        except OSError as exc:  # read-only dataset mount etc.
            print(f"(!) Could not save {dest} ({exc})")
        return train, test

    @staticmethod
    def read_classnames(text_file: str) -> "OrderedDict[str, str]":
        """Parse classnames.txt: each line '<wnid> <name words...>'.

        Splits on single spaces, NOT arbitrary whitespace — the reference
        (datasets/imagenet.py:72) uses ``strip().split(" ")``, so a name
        containing consecutive spaces must survive verbatim (the prompt
        string feeds the tokenizer; spacing changes logits)."""
        mapping = OrderedDict()
        with open(text_file) as f:
            for line in f:
                fields = line.strip().split(" ")
                if fields and fields[0]:
                    mapping[fields[0]] = " ".join(fields[1:])
        return mapping

    def _scan_split(self, split: str, wnid_to_name) -> list:
        """One Datum per image under images/<split>/<wnid>/, labels in
        sorted-wnid order (the reference's class indexing)."""
        base = os.path.join(self.image_dir, split)
        wnids = sorted(e.name for e in os.scandir(base) if e.is_dir())
        return [
            Datum(
                impath=os.path.join(base, wnid, fname),
                label=label,
                classname=wnid_to_name[wnid],
            )
            for label, wnid in enumerate(wnids)
            for fname in listdir_nohidden(os.path.join(base, wnid))
        ]
