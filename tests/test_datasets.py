"""Dataset-class tests over generated fake data trees."""
import json
import os
import random

import numpy as np
import pytest
from PIL import Image

from rpo_tpu.engine import get_cfg_default
from rpo_tpu.engine.registry import DATASET_REGISTRY

import rpo_tpu.data.datasets  # noqa: F401  (registry side-effects)

ALL_DATASETS = [
    "Caltech101", "DescribableTextures", "EuroSAT", "FGVCAircraft", "Food101",
    "ImageNet", "ImageNetA", "ImageNetR", "ImageNetSketch", "ImageNetV2",
    "OxfordFlowers", "OxfordPets", "StanfordCars", "SUN397", "Synthetic",
    "UCF101",
]


def test_all_datasets_registered():
    names = DATASET_REGISTRY.registered_names()
    for n in ALL_DATASETS:
        assert n in names, n


def _img(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(path)


def _cfg(root, name, shots=-1, subsample="all", seed=1):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.NAME = name
    cfg.DATASET.NUM_SHOTS = shots
    cfg.DATASET.SUBSAMPLE_CLASSES = subsample
    cfg.SEED = seed
    return cfg


@pytest.fixture
def caltech_tree(tmp_path):
    base = tmp_path / "caltech-101" / "101_ObjectCategories"
    for cls in ["airplanes", "Faces", "ant", "BACKGROUND_Google", "Faces_easy"]:
        for i in range(10):
            _img(str(base / cls / f"img_{i:03d}.jpg"))
    return tmp_path


def test_caltech_folder_split(caltech_tree):
    random.seed(1)
    ds = DATASET_REGISTRY.get("Caltech101")(_cfg(caltech_tree, "Caltech101"))
    # ignored classes dropped; renames applied
    assert set(ds.classnames) == {"airplane", "face", "ant"}
    assert ds.num_classes == 3
    # 50/20/30 per class of 10 images
    assert len(ds.train_x) == 15 and len(ds.val) == 6 and len(ds.test) == 9
    # split JSON persisted in the reference's format
    split_file = caltech_tree / "caltech-101" / "split_zhou_Caltech101.json"
    assert split_file.exists()
    split = json.load(open(split_file))
    assert set(split) == {"train", "val", "test"}
    impath, label, classname = split["train"][0]
    assert not impath.startswith("/")  # path prefix stripped

    # reload goes through read_split and yields identical items
    random.seed(99)  # different seed must not matter now
    ds2 = DATASET_REGISTRY.get("Caltech101")(_cfg(caltech_tree, "Caltech101"))
    assert sorted(d.impath for d in ds2.train_x) == sorted(d.impath for d in ds.train_x)


def test_fewshot_cache_and_subsample(caltech_tree):
    random.seed(1)
    ds = DATASET_REGISTRY.get("Caltech101")(
        _cfg(caltech_tree, "Caltech101", shots=2, subsample="base", seed=3)
    )
    assert len(ds.train_x) == 2 * 2  # ceil(3/2)=2 base classes x 2 shots
    cache = (
        caltech_tree / "caltech-101" / "split_fewshot" / "shot_2-seed_3.pkl"
    )
    assert cache.exists()
    # cache reused on rebuild: same items even with different random state
    random.seed(1234)
    ds2 = DATASET_REGISTRY.get("Caltech101")(
        _cfg(caltech_tree, "Caltech101", shots=2, subsample="base", seed=3)
    )
    assert sorted(d.impath for d in ds2.train_x) == sorted(
        d.impath for d in ds.train_x
    )
    # new split takes the other classes, relabeled from 0
    ds_new = DATASET_REGISTRY.get("Caltech101")(
        _cfg(caltech_tree, "Caltech101", shots=2, subsample="new", seed=3)
    )
    assert set(d.label for d in ds_new.test) == {0}  # 3 classes -> 1 new


def test_oxford_pets_annotations(tmp_path):
    pets = tmp_path / "oxford_pets"
    anno = pets / "annotations"
    os.makedirs(anno, exist_ok=True)
    lines_tv, lines_t = [], []
    for b, breed in enumerate(["Abyssinian", "english_setter"]):
        for i in range(5):
            name = f"{breed}_{i + 1}"
            _img(str(pets / "images" / f"{name}.jpg"))
            (lines_tv if i < 4 else lines_t).append(f"{name} {b + 1} 1 1")
    (anno / "trainval.txt").write_text("\n".join(lines_tv) + "\n")
    (anno / "test.txt").write_text("\n".join(lines_t) + "\n")

    random.seed(0)
    ds = DATASET_REGISTRY.get("OxfordPets")(_cfg(tmp_path, "OxfordPets"))
    assert set(ds.classnames) == {"abyssinian", "english_setter"}
    assert len(ds.test) == 2
    assert len(ds.train_x) + len(ds.val) == 8


def test_fgvc_aircraft_variant_files(tmp_path):
    air = tmp_path / "fgvc_aircraft"
    os.makedirs(air, exist_ok=True)
    (air / "variants.txt").write_text("707-320\nBoeing 717\n")
    for split, n in [("train", 3), ("val", 2), ("test", 2)]:
        rows = []
        for i in range(n):
            img_id = f"{split}{i:04d}"
            _img(str(air / "images" / f"{img_id}.jpg"))
            rows.append(f"{img_id} {'707-320' if i % 2 == 0 else 'Boeing 717'}")
        (air / f"images_variant_{split}.txt").write_text("\n".join(rows) + "\n")

    ds = DATASET_REGISTRY.get("FGVCAircraft")(_cfg(tmp_path, "FGVCAircraft"))
    assert ds.classnames == ["707-320", "Boeing 717"]
    assert len(ds.train_x) == 3 and len(ds.val) == 2 and len(ds.test) == 2


def test_imagenet_contract(tmp_path):
    """ImageNet on-disk contract (/root/reference/datasets/imagenet.py):
    preprocessed.pkl memoizes {train, test}; the few-shot cache payload
    is TRAIN-ONLY; val == test; labels follow sorted wnid order."""
    import pickle

    inet = tmp_path / "imagenet"
    os.makedirs(inet, exist_ok=True)
    (inet / "classnames.txt").write_text(
        "n00000002 great white shark\nn00000001 goldfish\n"
    )
    for split, per in [("train", 4), ("val", 2)]:
        for wnid in ["n00000002", "n00000001"]:
            for i in range(per):
                _img(str(inet / "images" / split / wnid / f"{i}.jpg"))

    ds = DATASET_REGISTRY.get("ImageNet")(_cfg(tmp_path, "ImageNet"))
    assert ds.classnames == ["goldfish", "great white shark"]  # sorted wnids
    assert len(ds.train_x) == 8 and len(ds.test) == 4
    assert [d.impath for d in ds.val] == [d.impath for d in ds.test]
    assert os.path.exists(inet / "preprocessed.pkl")

    # second construction must come from the cache (delete the images dir)
    import shutil

    shutil.rmtree(inet / "images")
    ds2 = DATASET_REGISTRY.get("ImageNet")(_cfg(tmp_path, "ImageNet", shots=2))
    assert len(ds2.train_x) == 4  # 2 shots x 2 classes
    fs = inet / "split_fewshot" / "shot_2-seed_1.pkl"
    assert fs.exists()
    with open(fs, "rb") as f:
        payload = pickle.load(f)
    assert set(payload) == {"train"}  # train-only payload, like the reference

    # base/new subsample halves (relabeled contiguously)
    ds3 = DATASET_REGISTRY.get("ImageNet")(_cfg(tmp_path, "ImageNet", subsample="new"))
    assert ds3.classnames == ["great white shark"]


def test_imagenet_a_folder_enumeration(tmp_path):
    ina = tmp_path / "imagenet-adversarial"
    img_dir = ina / "imagenet-a"
    os.makedirs(ina, exist_ok=True)
    (ina / "classnames.txt").write_text(
        "n00000001 goldfish\nn00000002 great white shark\n"
    )
    for wnid in ["n00000002", "n00000001"]:
        for i in range(2):
            _img(str(img_dir / wnid / f"{i}.jpg"))
    (img_dir / "README.txt").write_text("ignore me")

    ds = DATASET_REGISTRY.get("ImageNetA")(_cfg(tmp_path, "ImageNetA"))
    # labels = sorted folder enumeration
    assert ds.classnames == ["goldfish", "great white shark"]
    assert len(ds.test) == 4
    assert ds.train_x == ds.test  # test-only dataset


def test_ucf101_camelcase_rename(tmp_path):
    ucf = tmp_path / "ucf101"
    lst = ucf / "ucfTrainTestlist"
    os.makedirs(lst, exist_ok=True)
    (lst / "classInd.txt").write_text("1 ApplyEyeMakeup\n2 YoYo\n")
    rows_train, rows_test = [], []
    for action, renamed in [("ApplyEyeMakeup", "Apply_Eye_Makeup"), ("YoYo", "Yo_Yo")]:
        for i in range(8):
            fname = f"v_{action}_g{i:02d}.avi"
            _img(str(ucf / "UCF-101-midframes" / renamed / fname.replace(".avi", ".jpg")))
            (rows_train if i < 6 else rows_test).append(f"{action}/{fname} 1")
    (lst / "trainlist01.txt").write_text("\n".join(rows_train) + "\n")
    (lst / "testlist01.txt").write_text("\n".join(r.split(" ")[0] for r in rows_test) + "\n")

    random.seed(0)
    ds = DATASET_REGISTRY.get("UCF101")(_cfg(tmp_path, "UCF101"))
    assert set(ds.classnames) == {"Apply_Eye_Makeup", "Yo_Yo"}
    for item in ds.test:
        assert os.path.exists(item.impath)
