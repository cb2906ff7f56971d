"""Classify images with a trained prompt checkpoint — the serving path.

The reference exposes inference only through the protocol's `--eval-only`
dataset sweep; this utility serves ad-hoc images instead: build the
trainer (any registered method), load its checkpoint, run the
preprocessing + jitted eval step over a list of image files or a
directory, and print top-k classes per image (optionally as JSON lines).

    python tools/classify.py \
        --trainer RPO \
        --dataset-config-file configs/datasets/caltech101.yaml \
        --config-file configs/trainers/RPO/main_K24.yaml \
        --model-dir output/.../seed1 --load-epoch 15 \
        [--top-k 5] [--batch-size 100] [--json] \
        image1.jpg photos/ ...

Uses the same config merge, registry, checkpoint I/O, preprocessing
(native C++ decode path included), padded batching, and jitted eval step
as `trainer.test()` — so served predictions are bit-identical to
protocol evaluation.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".gif")


def _is_image_arg(p: str) -> bool:
    return (
        os.path.isdir(p)
        or p.lower().endswith(IMAGE_EXTS)
        or p.startswith("synthetic://")
    )


def split_images_and_opts(positionals):
    """argparse hands ALL contiguous positionals to the first nargs='+'
    slot, so 'img.jpg KEY VALUE' arrives as one list — partition it: the
    leading run of image files/dirs, then KEY VALUE config overrides."""
    for i, p in enumerate(positionals):
        if not _is_image_arg(p):
            return positionals[:i], positionals[i:]
    return list(positionals), []


def collect_images(paths):
    out = []
    for p in paths:
        if os.path.isdir(p):
            for name in sorted(os.listdir(p)):
                if name.lower().endswith(IMAGE_EXTS):
                    out.append(os.path.join(p, name))
        else:
            out.append(p)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument(
        "images", nargs="+",
        help="image files and/or directories, optionally followed by "
        "KEY VALUE config overrides",
    )
    ap.add_argument("--trainer", required=True)
    ap.add_argument("--dataset-config-file", required=True)
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--model-dir", default="", help="checkpoint directory "
                    "(omit for zero-shot / freshly initialized prompts)")
    ap.add_argument("--load-epoch", type=int, default=None)
    ap.add_argument("--root", default="", help="dataset root (classnames only)")
    ap.add_argument("--top-k", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=100)
    ap.add_argument("--json", action="store_true", help="one JSON object per line")
    args, extra = ap.parse_known_args(argv)

    image_args, opts = split_images_and_opts(args.images)
    if len(opts) % 2:
        print(f"config overrides must be KEY VALUE pairs, got {opts}", file=sys.stderr)
        return 1
    files = collect_images(image_args)
    if not files:
        print("no images found", file=sys.stderr)
        return 1

    import numpy as np

    import rpo_tpu.cli as cli

    import tempfile

    ns = argparse.Namespace(
        root=args.root, output_dir=tempfile.mkdtemp(prefix="rpo_classify_"),
        resume="", seed=-1,
        source_domains=None, target_domains=None, transforms=None,
        config_file=args.config_file, dataset_config_file=args.dataset_config_file,
        trainer=args.trainer, backbone="", head="", eval_only=True,
        model_dir=args.model_dir, load_epoch=args.load_epoch, no_train=True,
        opts=list(opts) + list(extra),
    )
    cfg = cli.setup_cfg(ns)

    from rpo_tpu.data.transforms import TransformPipeline
    from rpo_tpu.engine.trainer import build_trainer

    trainer = build_trainer(cfg)
    if args.model_dir:
        trainer.load_model(args.model_dir, epoch=args.load_epoch)
    classnames = trainer.dm.classnames
    tp = TransformPipeline(cfg.INPUT)

    import jax

    from rpo_tpu.parallel.dp import pad_multiple

    # batches must divide over a multi-device mesh (shard_map eval)
    B = pad_multiple(max(1, int(args.batch_size)), jax.device_count())
    k = min(args.top_k, len(classnames))
    for lo in range(0, len(files), B):
        chunk = files[lo : lo + B]
        imgs = np.stack([tp(f, train=False) for f in chunk])
        if len(chunk) < B:  # pad to the compiled batch shape
            pad = np.zeros((B - len(chunk),) + imgs.shape[1:], imgs.dtype)
            imgs = np.concatenate([imgs, pad])
        logits = np.asarray(trainer.model_inference(imgs), np.float32)[: len(chunk)]
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        for f, p in zip(chunk, probs):
            idx = np.argsort(-p)[:k]
            if args.json:
                print(json.dumps({
                    "image": f,
                    "top": [
                        {"class": classnames[i], "prob": round(float(p[i]), 4)}
                        for i in idx
                    ],
                }))
            else:
                best = ", ".join(
                    f"{classnames[i]} ({p[i]:.1%})" for i in idx
                )
                print(f"{f}: {best}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
