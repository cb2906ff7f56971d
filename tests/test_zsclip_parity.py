"""ZeroshotCLIP / ZeroshotCLIP2 numerical parity vs the torch oracle.

Pins the zero-shot text-feature construction — single custom template
(/root/reference/trainers/zsclip.py:42-52) and the ZeroshotCLIP2 prompt
ensembling (normalize per template -> mean -> renormalize,
zsclip.py:88-97 incl. the ImageNet custom-template exclusion) — and the
cosine-logit formula (zsclip.py:56-61) against the reference math driven
through the oracle CLIP, using the REAL production methods
(`ZeroshotCLIP._text_features_for` / `_select_templates`).

The reference's `self.templates += [...]` mutates the CLASS attribute
(templates accumulate across instantiations); ours copies the list,
matching single-run semantics — asserted here too.
"""
import types

import numpy as np
import pytest

import jax.numpy as jnp

from .oracle import make_small_torch_clip

torch = pytest.importorskip("torch")

CLASSNAMES = ["golden retriever", "tabby cat", "sports car", "daisy"]


def _our_zs(cls, params, cfg, dataset_name):
    zs = cls.__new__(cls)
    zs.clip_params = params
    zs.clip_cfg = cfg
    zs.dm = types.SimpleNamespace(classnames=CLASSNAMES)
    zs.cfg = types.SimpleNamespace(
        DATASET=types.SimpleNamespace(NAME=dataset_name)
    )
    return zs


@pytest.fixture(scope="module")
def oracle():
    model, params, cfg = make_small_torch_clip(seed=0)
    return model, params, cfg


def _torch_text_features(model, templates):
    """Reference ensembling math (zsclip.py:88-97; single template reduces
    to zsclip.py:48-52's plain normalize)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from rpo_tpu.tokenizer import tokenize

    mean = 0
    for temp in templates:
        prompts = [temp.format(c.replace("_", " ")) for c in CLASSNAMES]
        tokens = torch.from_numpy(np.asarray(tokenize(prompts)))
        with torch.no_grad():
            tf = model.encode_text(tokens).float()
        tf = tf / tf.norm(dim=-1, keepdim=True)
        mean = mean + tf
    mean = mean / len(templates)
    return (mean / mean.norm(dim=-1, keepdim=True)).numpy()


def test_zeroshot_single_template_parity(oracle):
    from rpo_tpu.methods.zsclip import CUSTOM_TEMPLATES, ZeroshotCLIP

    model, params, cfg = oracle
    zs = _our_zs(ZeroshotCLIP, params, cfg, "Caltech101")
    templates = zs._select_templates()
    assert templates == [CUSTOM_TEMPLATES["Caltech101"]]
    ours = np.asarray(zs._text_features_for(templates), np.float32)
    ref = _torch_text_features(model, templates)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    # cosine-logit formula on a fixed image feature (zsclip.py:56-61)
    rng = np.random.RandomState(0)
    imf = rng.randn(2, ref.shape[1]).astype(np.float32)
    imf /= np.linalg.norm(imf, axis=-1, keepdims=True)
    scale = float(np.exp(np.asarray(params["logit_scale"], np.float32)))
    np.testing.assert_allclose(
        scale * imf @ ours.T, scale * imf @ ref.T, rtol=1e-4, atol=1e-3
    )


def test_zeroshot2_ensembling_parity(oracle):
    from rpo_tpu.methods.templates import IMAGENET_TEMPLATES_SELECT
    from rpo_tpu.methods.zsclip import CUSTOM_TEMPLATES, ZeroshotCLIP2

    model, params, cfg = oracle
    zs = _our_zs(ZeroshotCLIP2, params, cfg, "DescribableTextures")
    templates = zs._select_templates()
    # SELECT templates + the dataset's custom one (zsclip.py:84-86)
    assert templates == list(IMAGENET_TEMPLATES_SELECT) + [
        CUSTOM_TEMPLATES["DescribableTextures"]
    ]
    ours = np.asarray(zs._text_features_for(templates), np.float32)
    ref = _torch_text_features(model, templates)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_zeroshot2_imagenet_excludes_custom_template(oracle):
    from rpo_tpu.methods.templates import IMAGENET_TEMPLATES_SELECT
    from rpo_tpu.methods.zsclip import ZeroshotCLIP2

    _, params, cfg = oracle
    zs = _our_zs(ZeroshotCLIP2, params, cfg, "ImageNet")
    assert zs._select_templates() == list(IMAGENET_TEMPLATES_SELECT)
    # and the class attribute is never mutated (the reference's
    # `self.templates +=` bug accumulates across instantiations)
    zs2 = _our_zs(ZeroshotCLIP2, params, cfg, "Caltech101")
    zs2._select_templates()
    assert list(ZeroshotCLIP2.templates) == list(IMAGENET_TEMPLATES_SELECT)
