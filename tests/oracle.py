"""Helpers to import reference modules as test oracles with their
external deps (dassl, torchvision, ftfy) stubbed."""
import importlib.util
import sys
import types
import unicodedata


def install_stubs():
    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda t: unicodedata.normalize("NFC", t)
        sys.modules["ftfy"] = stub
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        for name in ["Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"]:
            setattr(tvt, name, type(name, (), {"__init__": lambda self, *a, **k: None}))
        tvt.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    for mod_name, attrs in {
        "dassl": [],
        "dassl.engine": ["TRAINER_REGISTRY", "TrainerX"],
        "dassl.metrics": ["compute_accuracy"],
        "dassl.utils": ["load_pretrained_weights", "load_checkpoint"],
        "dassl.optim": ["build_optimizer", "build_lr_scheduler"],
    }.items():
        if mod_name not in sys.modules:
            m = types.ModuleType(mod_name)
            for a in attrs:
                if a == "TRAINER_REGISTRY":
                    setattr(
                        m, a,
                        types.SimpleNamespace(register=lambda *a, **k: (lambda c: c)),
                    )
                elif a == "TrainerX":
                    setattr(m, a, object)
                else:
                    setattr(m, a, lambda *a, **k: None)
            sys.modules[mod_name] = m


def load_reference_module(path: str, name: str):
    """Import a reference .py by path with /root/reference on sys.path."""
    install_stubs()
    sys.path.insert(0, "/root/reference")
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove("/root/reference")


def make_small_torch_clip(seed: int = 0):
    """Small reference CLIP (res 32, widths 64/128) + converted params."""
    import torch

    from rpo_tpu.models.clip import convert_state_dict, infer_config

    mod = load_reference_module("/root/reference/clip/model.py", "_oracle_clip_model")
    torch.manual_seed(seed)
    model = mod.CLIP(
        embed_dim=64,
        image_resolution=32,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=16,
        context_length=77,
        vocab_size=49408,
        transformer_width=128,
        transformer_heads=2,
        transformer_layers=2,
    ).float().eval()
    sd = model.state_dict()
    params = convert_state_dict(sd)
    cfg = infer_config({k: v.numpy() for k, v in sd.items()})
    return model, params, cfg
