#!/usr/bin/env python
"""Measure the PyTorch reference's RPO throughput on a CUDA GPU.

Every `vs_baseline` multiple in bench.py currently divides by a
DOCUMENTED ESTIMATE (100 train / 400 eval img/s on a V100/A100-class
GPU) because the reference publishes no numbers and this offline TPU
environment has no CUDA.  This script is the recipe for replacing the
estimate with a measurement: run it on any machine with a CUDA GPU and
a checkout of mlvlab/RPO, and paste the resulting JSON next to
BENCH_r*.json.

It times exactly what bench.py times, on the reference implementation:
  * train: CustomCLIP forward + backward + SGD step at the protocol
    config (batch 4, K=24, fp16, n_cls 51) — the same math as
    RPO.forward_backward (/root/reference/trainers/rpo.py:290-316)
    without the Dassl batch-bookkeeping around it.
  * eval: no-grad CustomCLIP forward at batch 100.
Timing discipline matches bench.py: warmup, torch.cuda.synchronize
around each pass, best of 3 passes.

Usage (on the GPU box):
    python tools/bench_reference_gpu.py --reference /path/to/RPO \
        [--checkpoint /path/to/ViT-B-16.pt] [--device cuda]

Random-initialized weights are used unless --checkpoint is given —
throughput does not depend on weight values.  The reference's external
deps (dassl, torchvision, ftfy) are stubbed if missing: only
CustomCLIP/PromptLearner are exercised, not the Dassl trainer shell.

Smoke-testable without CUDA: --device cpu --layers 2 --steps 3 runs the
full harness on a 2-layer tower in fp32 (numbers meaningless, plumbing
proven).
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import time
import types
import unicodedata


def _install_stubs() -> None:
    """Stub dassl/torchvision/ftfy if absent — the model classes under
    test import them at module scope but never call into them here."""
    if "ftfy" not in sys.modules:
        try:
            import ftfy  # noqa: F401
        except ImportError:
            stub = types.ModuleType("ftfy")
            stub.fix_text = lambda t: unicodedata.normalize("NFC", t)
            sys.modules["ftfy"] = stub
    try:
        import torchvision  # noqa: F401
    except ImportError:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        for name in ["Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"]:
            setattr(tvt, name, type(name, (), {"__init__": lambda self, *a, **k: None}))
        tvt.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    try:
        import dassl.engine  # noqa: F401
    except ImportError:
        for mod_name, attrs in {
            "dassl": [],
            "dassl.engine": ["TRAINER_REGISTRY", "TrainerX"],
            "dassl.metrics": ["compute_accuracy"],
            "dassl.utils": ["load_pretrained_weights", "load_checkpoint"],
            "dassl.optim": ["build_optimizer", "build_lr_scheduler"],
        }.items():
            m = types.ModuleType(mod_name)
            for a in attrs:
                if a == "TRAINER_REGISTRY":
                    m.TRAINER_REGISTRY = types.SimpleNamespace(
                        register=lambda *a, **k: (lambda c: c)
                    )
                elif a == "TrainerX":
                    m.TrainerX = object
                else:
                    setattr(m, a, lambda *a, **k: None)
            sys.modules[mod_name] = m


def _load_by_path(path: str, name: str, ref_root: str):
    _install_stubs()
    sys.path.insert(0, ref_root)
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(ref_root)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--reference", default="/root/reference",
                   help="path to the mlvlab/RPO checkout")
    p.add_argument("--checkpoint", default=None,
                   help="optional ViT-B-16.pt (jit archive or state dict); "
                        "random init if omitted")
    p.add_argument("--device", default=None, help="cuda (default if available) or cpu")
    p.add_argument("--prec", default=None, choices=["fp16", "fp32"],
                   help="default: fp16 on cuda (the protocol), fp32 on cpu")
    p.add_argument("--batch", type=int, default=4, help="train batch (protocol: 4)")
    p.add_argument("--eval-batch", type=int, default=100)
    p.add_argument("--k", type=int, default=24, help="prompt pairs (protocol main_K24)")
    p.add_argument("--n-cls", type=int, default=51, help="class count (bench.py parity)")
    p.add_argument("--layers", type=int, default=12,
                   help="tower depth; 12 = real ViT-B/16, smaller for smoke tests")
    p.add_argument("--steps", type=int, default=50, help="timed steps per pass")
    p.add_argument("--passes", type=int, default=3, help="best-of-N passes")
    args = p.parse_args()

    import torch
    import torch.nn.functional as F

    device = args.device or ("cuda" if torch.cuda.is_available() else "cpu")
    dev_type = torch.device(device).type  # "cuda:0" counts as cuda
    prec = args.prec or ("fp16" if dev_type == "cuda" else "fp32")

    clip_mod = _load_by_path(f"{args.reference}/clip/model.py", "_ref_clip_model",
                             args.reference)
    rpo_mod = _load_by_path(f"{args.reference}/trainers/rpo.py", "_ref_rpo",
                            args.reference)

    if args.checkpoint:
        # Reference loader semantics (clip/clip.py:94-118): jit archive
        # preferred, plain state dict fallback; build_model infers shapes.
        try:
            sd = torch.jit.load(args.checkpoint, map_location="cpu").state_dict()
        except RuntimeError:
            sd = torch.load(args.checkpoint, map_location="cpu")
        clip_model = clip_mod.build_model(sd)  # returns fp16 weights
    else:
        torch.manual_seed(0)
        clip_model = clip_mod.CLIP(
            embed_dim=512, image_resolution=224, vision_layers=args.layers,
            vision_width=768, vision_patch_size=16, context_length=77,
            vocab_size=49408, transformer_width=512, transformer_heads=8,
            transformer_layers=args.layers,
        )
        if prec == "fp16":
            clip_mod.convert_weights(clip_model)
    if prec == "fp32":
        clip_model.float()
    clip_model = clip_model.to(device).eval()

    cfg = types.SimpleNamespace(
        TRAINER=types.SimpleNamespace(RPO=types.SimpleNamespace(
            K=args.k, CTX_INIT="a photo of a", PREC=prec)),
        INPUT=types.SimpleNamespace(SIZE=(224, 224)),
    )
    classnames = [f"object category {i}" for i in range(args.n_cls)]
    model = rpo_mod.CustomCLIP(cfg, classnames, "a photo of a _.", clip_model).to(device)

    # Protocol optimizer (configs/trainers/RPO/main_K24.yaml): SGD
    # lr 0.01, momentum 0.9, weight decay 5e-4 on prompt_learner only.
    for name, param in model.named_parameters():
        param.requires_grad_("prompt_learner" in name)
    optim = torch.optim.SGD(model.prompt_learner.parameters(), lr=0.01,
                            momentum=0.9, weight_decay=5e-4)

    torch.manual_seed(1)
    imgs = torch.randn(args.batch, 3, 224, 224, device=device)
    labels = torch.randint(0, args.n_cls, (args.batch,), device=device)
    eimgs = torch.randn(args.eval_batch, 3, 224, 224, device=device)

    def sync():
        if dev_type == "cuda":
            torch.cuda.synchronize(torch.device(device))

    def train_pass(n: int) -> float:
        model.prompt_learner.train()
        sync()
        t0 = time.perf_counter()
        for _ in range(n):
            loss = model(imgs, labels)
            optim.zero_grad()
            loss.backward()
            optim.step()
            # Faithfulness note: self.text_x is a plain attribute the
            # reference leaves on the HOST (nn.Module.to does not move
            # it), so forward's text_x.to(device) copies every step and
            # its in-place prompt writes are graph-safe.  When the
            # compute device IS cpu that copy is an identity and the
            # write poisons autograd across steps — detach to restore
            # the exact cuda semantics (the overwritten positions are
            # fully re-written each forward, so values are identical).
            if model.text_x.device.type == dev_type:
                model.text_x = model.text_x.detach()
        sync()
        return n / (time.perf_counter() - t0)

    def eval_pass(n: int) -> float:
        model.prompt_learner.eval()
        with torch.no_grad():
            sync()
            t0 = time.perf_counter()
            for _ in range(n):
                logits = model(eimgs)
            sync()
            del logits
        return n / (time.perf_counter() - t0)

    train_pass(max(2, args.steps // 10))  # warmup (cudnn autotune, allocator)
    train_sps = max(train_pass(args.steps) for _ in range(args.passes))
    eval_pass(2)
    eval_sps = max(eval_pass(max(3, args.steps // 5)) for _ in range(args.passes))

    print(json.dumps({
        "metric": "reference_rpo_train_images_per_sec",
        "value": round(train_sps * args.batch, 2),
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "extras": {
            "eval_images_per_sec": round(eval_sps * args.eval_batch, 2),
            "train_steps_per_sec": round(train_sps, 2),
            "device": device,
            "device_name": (torch.cuda.get_device_name(torch.device(device))
                            if dev_type == "cuda" else "cpu"),
            "prec": prec,
            "batch": args.batch,
            "eval_batch": args.eval_batch,
            "k": args.k,
            "n_cls": args.n_cls,
            "layers": args.layers,
            "weights": "checkpoint" if args.checkpoint else "random-init",
        },
    }))


if __name__ == "__main__":
    main()
