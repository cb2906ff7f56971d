"""bf16 production precision vs fp32 on the full RPO path.

The accuracy-parity budget is 0.3% (BASELINE.json); what matters is how
often bf16 flips the argmax prediction relative to fp32.  With the fp32
LayerNorm/softmax islands in place, flips should be confined to
near-ties (tiny logit margins).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpo_tpu.methods import rpo as core
from rpo_tpu.models.clip import cast_params, init_clip
from rpo_tpu.models.clip.model import CLIPConfig


@pytest.mark.slow
def test_bf16_rpo_argmax_stability():
    # ViT-B/16-shaped widths, shallow depth (realistic numerics regime)
    cfg = CLIPConfig(vision_layers=4, text_layers=4, image_resolution=64)
    params32 = init_clip(jax.random.PRNGKey(0), cfg)
    params16 = cast_params(params32, jnp.bfloat16)
    classnames = [f"thing {i}" for i in range(12)]
    task = core.make_task(cfg, classnames, "a photo of a _.", K=4)
    prompts = core.init_prompts(jax.random.PRNGKey(1), params32, cfg, 4)

    frozen32 = core.make_frozen(params32, task)
    frozen16 = core.make_frozen(params16, task)

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(64, 64, 64, 3), jnp.float32)
    l32 = np.asarray(core.rpo_logits(prompts, frozen32, task, imgs), np.float32)
    l16 = np.asarray(core.rpo_logits(prompts, frozen16, task, imgs), np.float32)

    # absolute drift small relative to the logit scale
    assert np.abs(l32 - l16).max() < 0.25 * np.abs(l32).mean(), (
        np.abs(l32 - l16).max(), np.abs(l32).mean())

    p32 = l32.argmax(-1)
    p16 = l16.argmax(-1)
    flips = p32 != p16
    # any prediction flip must be a near-tie in fp32
    if flips.any():
        margins = np.sort(l32[flips], axis=-1)
        gap = margins[:, -1] - margins[:, -2]
        assert gap.max() < 0.05 * np.abs(l32).mean(), gap
    # and flips must be rare
    assert flips.mean() <= 0.1, flips.mean()
