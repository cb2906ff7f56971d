"""RPO forward/backward parity vs the actual reference implementation.

The reference ``trainers/rpo.py`` is imported with its external deps
(dassl, torchvision, ftfy) stubbed, so the oracle is the real
CustomCLIP/PromptLearner code — not a re-transcription.  The reference
hardcodes d_v=768, d_t=512 and the 14x14 patch grid (rpo.py:52,185,154),
so the oracle model must be ViT-B/16-shaped; we shrink depth only.

Compared: mask truth tables, logits, cross-entropy loss, and the
gradients w.r.t. both prompt tensors (the only trainable state).
"""
import importlib.util
import sys
import types
import unicodedata

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpo_tpu.methods import rpo as jrpo
from rpo_tpu.models.clip import CLIPConfig, convert_state_dict

torch = pytest.importorskip("torch")

K = 3
N_CLS = 4
CLASSNAMES = ["golden retriever", "tabby cat", "sports car", "daisy"]
PROMPT = "a photo of a _."


def _install_stubs():
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
                    setattr(m, a, types.SimpleNamespace(register=lambda *a, **k: (lambda c: c)))
                elif a == "TrainerX":
                    setattr(m, a, object)
                else:
                    setattr(m, a, lambda *a, **k: None)
            sys.modules[mod_name] = m


@pytest.fixture(scope="module")
def ref_rpo_module():
    _install_stubs()
    sys.path.insert(0, "/root/reference")
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_rpo", "/root/reference/trainers/rpo.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove("/root/reference")


def _ref_cfg():
    rpo_ns = types.SimpleNamespace(K=K, CTX_INIT="a photo of a", PREC="fp32")
    return types.SimpleNamespace(
        TRAINER=types.SimpleNamespace(RPO=rpo_ns),
        INPUT=types.SimpleNamespace(SIZE=(224, 224)),
    )


@pytest.fixture(scope="module")
def pair(ref_rpo_module):
    """(reference CustomCLIP, our prompts/frozen/task) with identical weights."""
    spec = importlib.util.spec_from_file_location(
        "_ref_clip_model2", "/root/reference/clip/model.py"
    )
    ref_clip_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_clip_mod)

    torch.manual_seed(0)
    # ViT-B/16 shape (res 224, widths 768/512) with depth 2 — the reference
    # RPO code hardcodes those widths and the 14x14 grid.
    clip_model = ref_clip_mod.CLIP(
        embed_dim=512,
        image_resolution=224,
        vision_layers=2,
        vision_width=768,
        vision_patch_size=16,
        context_length=77,
        vocab_size=49408,
        transformer_width=512,
        transformer_heads=8,
        transformer_layers=2,
    ).float().eval()

    ref_model = ref_rpo_module.CustomCLIP(_ref_cfg(), CLASSNAMES, PROMPT, clip_model)
    ref_model = ref_model.float().eval()

    params = convert_state_dict(clip_model.state_dict())
    cfg = CLIPConfig(vision_layers=2, text_layers=2)
    task = jrpo.make_task(cfg, CLASSNAMES, PROMPT, K)
    prompts = {
        "text_prompt": jnp.asarray(ref_model.prompt_learner.text_prompt.detach().numpy()),
        "img_prompt": jnp.asarray(ref_model.prompt_learner.img_prompt.detach().numpy()),
    }
    return ref_model, params, task, prompts


def test_tokenization_and_lengths(pair):
    ref_model, _, task, _ = pair
    np.testing.assert_array_equal(
        task.text_tokens, ref_model.text_tokenized.numpy().astype(np.int32)
    )
    np.testing.assert_array_equal(
        task.len_prompts, ref_model.len_prompts.numpy().astype(np.int32)
    )


def test_text_mask_truth_table(pair):
    ref_model, _, task, _ = pair
    # reference: (n_cls*8, 77, 77) with -inf; ours: (n_cls, 1, 77, 77) big-neg
    ref = ref_model.text_mask.numpy().reshape(N_CLS, 8, 77, 77)[:, 0]
    ours = task.text_mask[:, 0]
    np.testing.assert_array_equal(np.isneginf(ref), ours < -1e8)
    assert (ours[np.logical_not(np.isneginf(ref))] == 0).all()


def test_visual_mask_truth_table(pair):
    ref_model, _, task, _ = pair
    ref = ref_model.visual_mask.numpy()
    ours = task.visual_mask[0, 0]
    assert ref.shape == ours.shape == (197 + K, 197 + K)
    np.testing.assert_array_equal(np.isneginf(ref), ours < -1e8)


def test_logits_parity(pair):
    ref_model, params, task, prompts = pair
    rng = np.random.RandomState(3)
    imgs = rng.randn(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref_model(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(jrpo.rpo_logits(prompts, params, task, jnp.asarray(imgs)))
    np.testing.assert_allclose(ours, ref_logits, rtol=2e-3, atol=2e-3)


def test_loss_and_grad_parity(pair):
    ref_model, params, task, prompts = pair
    rng = np.random.RandomState(4)
    imgs = rng.randn(2, 224, 224, 3).astype(np.float32)
    labels = np.array([1, 3])

    ref_model.prompt_learner.train()  # training flag -> returns CE loss
    ref_model.zero_grad()
    loss_t = ref_model(
        torch.from_numpy(imgs).permute(0, 3, 1, 2), torch.from_numpy(labels)
    )
    loss_t.backward()
    ref_gt = ref_model.prompt_learner.text_prompt.grad.numpy()
    ref_gi = ref_model.prompt_learner.img_prompt.grad.numpy()
    ref_model.prompt_learner.eval()

    (loss_j, _), grads = jax.value_and_grad(jrpo.rpo_loss, has_aux=True)(
        prompts, params, task, jnp.asarray(imgs), jnp.asarray(labels)
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(grads["text_prompt"]), ref_gt, rtol=5e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(grads["img_prompt"]), ref_gi, rtol=5e-3, atol=1e-5
    )


def test_eval_fast_path_matches(pair):
    """Precomputed text features (eval path) must equal the joint path."""
    _, params, task, prompts = pair
    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.randn(2, 224, 224, 3).astype(np.float32))
    text_x = jrpo.precompute_text_x(params, task)
    text_f = jrpo.encode_text_with_prompts(prompts, params, task, text_x)
    fast = jrpo.rpo_logits(prompts, params, task, imgs, text_f=text_f)
    joint = jrpo.rpo_logits(prompts, params, task, imgs)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(joint), rtol=1e-5, atol=1e-5)


def test_prompt_init_distribution(pair):
    """init_prompts: mean ≈ EOT/CLS embedding, offset norm == 0.1."""
    _, params, task, _ = pair
    prompts = jrpo.init_prompts(jax.random.PRNGKey(0), params, task.cfg, K)
    eot = np.asarray(params["text"]["token_embedding"][49407], np.float32)
    offs = np.asarray(prompts["text_prompt"]) - eot[None]
    np.testing.assert_allclose(np.linalg.norm(offs, axis=-1), 0.1, rtol=1e-5)
    cls = np.asarray(params["visual"]["class_embedding"], np.float32)
    offs_v = np.asarray(prompts["img_prompt"]) - cls[None]
    np.testing.assert_allclose(np.linalg.norm(offs_v, axis=-1), 0.1, rtol=1e-5)
