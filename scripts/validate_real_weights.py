"""Validate the rebuild against REAL CLIP weights (VERDICT r1 missing #4).

One command that produces accuracy/parity numbers with real weights, or
documents precisely why this environment cannot:

    python scripts/validate_real_weights.py \
        [--backbone ViT-B/16] [--root $DATA] [--dataset caltech101] \
        [--rpo-checkpoint output/.../prompt_learner/model.pth.tar-15] \
        [--skip-torch]

Stages (each runs when its inputs exist, is skipped loudly otherwise):
  1. Checkpoint resolution ($CLIP_CHECKPOINT -> $CLIP_CACHE_DIR ->
     download when RPO_TPU_ALLOW_DOWNLOAD=1), as in
     rpo_tpu/models/clip/pretrained.py.
  2. Real-weights tower parity: the SAME state dict loaded into this
     framework (convert.load_clip) and into the reference torch model
     (/root/reference/clip/model.py build_model), encode_image /
     encode_text compared on fixed inputs.  This validates the converter
     and both towers on real weights with no dataset needed.
  3. Semantic smoke: real CLIP weights must order obvious text/text
     similarities correctly; random weights fail this immediately.
  4. Zero-shot dataset eval (needs --root with the dataset downloaded):
     ZeroshotCLIP accuracy vs the published CLIP ViT-B/16 numbers.
  5. RPO checkpoint eval (needs --rpo-checkpoint + --root): evaluates a
     trained/released prompt checkpoint (rpo.zip format supported by the
     torch-compat loader) on the base/new split.

Exit codes: 0 = everything that could run passed; 1 = a validation
FAILED; 2 = no weights available (diagnosis printed).
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.environ.get("RPO_TPU_FORCE_CPU"):
    # the JAX_PLATFORMS env var is ignored on this environment's
    # force-registered axon TPU platform (CLAUDE.md); pin via config
    import jax

    jax.config.update("jax_platforms", "cpu")

# Published zero-shot CLIP ViT-B/16 accuracies under the CoOp/RPO
# protocol (base/new class halves, Table 1 of the CoCoOp/RPO papers).
# EXTERNAL numbers from the papers — tolerance is generous; tighten after
# pinning against a reference run.
ZEROSHOT_EXPECTED = {
    "caltech101": {"base": 96.84, "new": 94.00},
    "imagenet": {"base": 72.43, "new": 68.14},
    "oxford_pets": {"base": 91.17, "new": 97.26},
}
TOLERANCE_PCT = 1.5


def diagnose_missing(backbone: str) -> None:
    explicit = os.environ.get("CLIP_CHECKPOINT")
    cache_dir = os.environ.get("CLIP_CACHE_DIR", os.path.expanduser("~/.cache/clip"))
    print(f"No real weights for {backbone}. Resolution attempted:")
    print(
        f"  1. $CLIP_CHECKPOINT = {explicit!r}"
        + ("" if explicit else " (unset)")
        + ("" if not explicit or os.path.exists(explicit) else " (file missing)")
    )
    print(f"  2. cache dir {cache_dir}: not found")
    if os.environ.get("RPO_TPU_ALLOW_DOWNLOAD") == "1":
        # report the ACTUAL failure, probed fresh — do not guess
        import socket

        host = "openaipublic.azureedge.net"
        try:
            socket.getaddrinfo(host, 443)
            reason = (
                f"DNS for {host} resolves; the download failed for another "
                "reason (see the downloader's message above — e.g. HTTP "
                "error, checksum mismatch, or disk)"
            )
        except OSError as exc:
            reason = f"no network egress (DNS for {host} fails: {exc})"
        print(f"  3. download attempted and FAILED — {reason}.")
    else:
        print("  3. download not attempted (set RPO_TPU_ALLOW_DOWNLOAD=1)")
    print(
        "To validate: copy the official ViT-B-16.pt into the cache dir or "
        "set $CLIP_CHECKPOINT, then re-run this script."
    )


def torch_tower_parity(path: str, jparams, jcfg) -> None:
    """Load the same checkpoint into the reference torch CLIP and compare
    tower outputs (converter + numerics validation on real weights)."""
    import numpy as np
    import torch

    from tests.oracle import load_reference_module

    import jax.numpy as jnp

    from rpo_tpu.models.clip.model import encode_image, encode_text
    from rpo_tpu.tokenizer import tokenize

    mod = load_reference_module("/root/reference/clip/model.py", "_ref_clip_model")
    with open(path, "rb") as f:
        try:
            sd = torch.jit.load(f, map_location="cpu").state_dict()
        except RuntimeError:
            f.seek(0)
            sd = torch.load(f, map_location="cpu")
    model = mod.build_model(sd).float().eval()

    rng = np.random.RandomState(0)
    images = rng.randn(2, jcfg.image_resolution, jcfg.image_resolution, 3).astype(
        np.float32
    )
    tokens = tokenize(["a photo of a dog.", "a diagram of a large airplane"])
    with torch.no_grad():
        t_img = model.encode_image(
            torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()
        t_txt = model.encode_text(torch.from_numpy(tokens)).numpy()
    j_img = np.asarray(encode_image(jparams, jcfg, jnp.asarray(images)))
    j_txt = np.asarray(
        encode_text(jparams, jcfg, jnp.asarray(tokens))
    )
    img_err = np.abs(t_img - j_img).max() / (np.abs(t_img).max() + 1e-9)
    txt_err = np.abs(t_txt - j_txt).max() / (np.abs(t_txt).max() + 1e-9)
    print(f"tower parity vs reference torch: image rel-err {img_err:.2e}, "
          f"text rel-err {txt_err:.2e}")
    assert img_err < 2e-3 and txt_err < 2e-3, "REAL-WEIGHTS TOWER PARITY FAILED"
    print("tower parity: OK")


def semantic_smoke(jparams, jcfg) -> None:
    import numpy as np

    import jax.numpy as jnp

    from rpo_tpu.models.clip.model import encode_text
    from rpo_tpu.tokenizer import tokenize

    texts = [
        "a photo of a cat.",
        "a photo of a kitten.",
        "a photo of an airplane.",
    ]
    feats = np.asarray(encode_text(jparams, jcfg, jnp.asarray(tokenize(texts))))
    feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    sim_cat_kitten = float(feats[0] @ feats[1])
    sim_cat_plane = float(feats[0] @ feats[2])
    print(f"semantic smoke: sim(cat,kitten)={sim_cat_kitten:.3f} "
          f"sim(cat,airplane)={sim_cat_plane:.3f}")
    assert sim_cat_kitten > sim_cat_plane + 0.05, (
        "SEMANTIC SMOKE FAILED — weights do not behave like trained CLIP"
    )
    print("semantic smoke: OK")


def zeroshot_eval(args, backbone: str) -> None:
    from rpo_tpu.engine import build_trainer, get_cfg_default

    import rpo_tpu.data.datasets  # noqa: F401
    import rpo_tpu.methods  # noqa: F401

    for split in ("base", "new"):
        cfg = get_cfg_default()
        cfg.merge_from_file(
            os.path.join(REPO, f"configs/datasets/{args.dataset}.yaml")
        )
        cfg.merge_from_file(
            os.path.join(REPO, "configs/trainers/RPO/main_K24.yaml")
        )
        cfg.TRAINER.NAME = "ZeroshotCLIP"
        cfg.DATASET.ROOT = args.root
        cfg.DATASET.NUM_SHOTS = -1
        cfg.DATASET.SUBSAMPLE_CLASSES = split
        cfg.MODEL.BACKBONE.NAME = backbone
        cfg.OUTPUT_DIR = args.output_dir
        trainer = build_trainer(cfg)
        acc = trainer.test()
        expected = ZEROSHOT_EXPECTED.get(args.dataset, {}).get(split)
        line = f"zero-shot {args.dataset}/{split}: accuracy {acc:.2f}%"
        if expected is not None:
            line += f" (published {expected:.2f}%, tolerance {TOLERANCE_PCT}%)"
            assert abs(acc - expected) <= TOLERANCE_PCT, (
                f"ZERO-SHOT ACCURACY OUT OF TOLERANCE: {acc:.2f} vs {expected:.2f}"
            )
        print(line)
    print("zero-shot eval: OK")


def rpo_checkpoint_eval(args, backbone: str) -> None:
    from rpo_tpu.engine import build_trainer, get_cfg_default

    import rpo_tpu.data.datasets  # noqa: F401
    import rpo_tpu.methods  # noqa: F401

    cfg = get_cfg_default()
    cfg.merge_from_file(os.path.join(REPO, f"configs/datasets/{args.dataset}.yaml"))
    cfg.merge_from_file(os.path.join(REPO, "configs/trainers/RPO/main_K24.yaml"))
    cfg.TRAINER.NAME = "RPO"
    cfg.DATASET.ROOT = args.root
    cfg.DATASET.NUM_SHOTS = -1
    cfg.DATASET.SUBSAMPLE_CLASSES = args.rpo_subsample
    cfg.MODEL.BACKBONE.NAME = backbone
    cfg.MODEL.INIT_WEIGHTS = args.rpo_checkpoint
    cfg.OUTPUT_DIR = args.output_dir
    trainer = build_trainer(cfg)
    acc = trainer.test()
    print(
        f"RPO checkpoint {args.rpo_checkpoint} on {args.dataset}/"
        f"{args.rpo_subsample}: accuracy {acc:.2f}% "
        "(compare to the released-table value for this dataset/seed)"
    )


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--backbone", default="ViT-B/16")
    ap.add_argument("--root", default="", help="dataset root ($DATA)")
    ap.add_argument("--dataset", default="caltech101")
    ap.add_argument("--rpo-checkpoint", default="",
                    help="trained/released RPO prompt checkpoint to evaluate")
    ap.add_argument("--rpo-subsample", default="base", choices=["base", "new", "all"])
    ap.add_argument("--output-dir", default="/tmp/validate_real_weights")
    ap.add_argument("--skip-torch", action="store_true",
                    help="skip the reference-torch tower parity stage")
    args = ap.parse_args()

    from rpo_tpu.models.clip.pretrained import find_checkpoint

    try:
        path = find_checkpoint(args.backbone)
    except FileNotFoundError as exc:  # explicit $CLIP_CHECKPOINT typo
        print(exc)
        diagnose_missing(args.backbone)
        return 2
    if path is None:
        diagnose_missing(args.backbone)
        return 2
    print(f"weights: {path}")

    from rpo_tpu.models.clip.convert import load_clip

    jparams, jcfg = load_clip(path)
    print(f"loaded {args.backbone}: resolution {jcfg.image_resolution}, "
          f"embed {jcfg.embed_dim}")

    if not args.skip_torch:
        torch_tower_parity(path, jparams, jcfg)
    semantic_smoke(jparams, jcfg)

    dataset_dir_ok = args.root and os.path.isdir(args.root)
    if dataset_dir_ok:
        zeroshot_eval(args, args.backbone)
        if args.rpo_checkpoint:
            rpo_checkpoint_eval(args, args.backbone)
    else:
        print(
            "dataset eval: SKIPPED — pass --root pointing at a data root "
            f"containing {args.dataset} (not present in this offline "
            "environment; see DATASETS.md for the expected layout)"
        )
        if args.rpo_checkpoint:
            print("RPO checkpoint eval: SKIPPED (needs --root)")
    print("validate_real_weights: PASSED (all runnable stages)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
