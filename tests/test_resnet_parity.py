"""ModifiedResNet visual tower parity vs the torch reference."""
import numpy as np
import pytest

import jax.numpy as jnp

from rpo_tpu.models.clip import CLIPConfig, convert_state_dict, encode_image, infer_config

from .oracle import load_reference_module

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def rn_pair():
    mod = load_reference_module("/root/reference/clip/model.py", "_oracle_rn_clip")
    torch.manual_seed(0)
    model = mod.CLIP(
        embed_dim=64,
        image_resolution=64,
        vision_layers=(1, 1, 1, 1),
        vision_width=32,
        vision_patch_size=None,
        context_length=77,
        vocab_size=49408,
        transformer_width=128,
        transformer_heads=2,
        transformer_layers=2,
    ).float().eval()
    # randomize BN running stats so the test covers stat folding
    with torch.no_grad():
        for m in model.modules():
            if isinstance(torch.nn, object) and m.__class__.__name__ == "BatchNorm2d":
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    sd = model.state_dict()
    params = convert_state_dict(sd)
    cfg = infer_config({k: v.numpy() for k, v in sd.items()})
    return model, params, cfg


def test_rn_config_inference(rn_pair):
    _, _, cfg = rn_pair
    assert cfg.vision_layers == (1, 1, 1, 1)
    assert cfg.vision_width == 32
    assert cfg.image_resolution == 64
    assert cfg.embed_dim == 64
    assert not cfg.is_vit


def test_rn_encode_image_parity(rn_pair):
    model, params, cfg = rn_pair
    rng = np.random.RandomState(0)
    imgs = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = model.encode_image(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(encode_image(params, cfg, jnp.asarray(imgs)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_rn_clip_forward_parity(rn_pair):
    from rpo_tpu.models.clip import clip_forward

    model, params, cfg = rn_pair
    rng = np.random.RandomState(1)
    imgs = rng.randn(2, 64, 64, 3).astype(np.float32)
    toks = np.zeros((3, 77), dtype=np.int64)
    toks[:, 0] = 49406
    toks[:, 1:4] = rng.randint(1, 49000, (3, 3))
    toks[:, 4] = 49407
    with torch.no_grad():
        ref_i, _ = model(torch.from_numpy(imgs).permute(0, 3, 1, 2), torch.from_numpy(toks))
    ours_i, _ = clip_forward(params, cfg, jnp.asarray(imgs), jnp.asarray(toks.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours_i), ref_i.numpy(), rtol=2e-3, atol=2e-3)
