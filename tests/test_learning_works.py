"""End-to-end learning sanity: on a learnable task (one fixed image per
class), RPO prompt training must push accuracy far above chance even
with a randomly initialized backbone — validating that gradients,
optimizer, masks, and the eval path actually cohere."""
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpo_tpu.data.datum import Datum
from rpo_tpu.data.loader import BatchLoader
from rpo_tpu.data.transforms import TransformPipeline
from rpo_tpu.engine.optim import sgd_init, sgd_update
from rpo_tpu.methods import rpo as core
from rpo_tpu.models.clip import TINY, init_clip


class _Input:
    SIZE = (32, 32)
    INTERPOLATION = "bicubic"
    RRCROP_SCALE = (0.08, 1.0)
    TRANSFORMS = ("normalize",)  # no augmentation: images are class-constant
    PIXEL_MEAN = [0.5, 0.5, 0.5]
    PIXEL_STD = [0.5, 0.5, 0.5]


@pytest.mark.slow
def test_rpo_learns_separable_task():
    n_cls = 4
    # one deterministic image per class, repeated: perfectly separable
    items = [
        Datum(impath=f"synthetic://fixed/{c}/0", label=c, classname=f"thing {c}")
        for c in range(n_cls)
        for _ in range(4)
    ]
    tr = TransformPipeline(_Input)
    loader = BatchLoader(items, tr, batch_size=8, train=True, shuffle=True,
                         num_workers=1)

    cfg = TINY
    params = init_clip(jax.random.PRNGKey(0), cfg)
    task = core.make_task(cfg, [f"thing {c}" for c in range(n_cls)], "a photo of a _.", K=4)
    frozen = core.make_frozen(params, task)
    prompts = core.init_prompts(jax.random.PRNGKey(1), params, cfg, 4)
    opt = sgd_init(prompts)

    mean = np.asarray(_Input.PIXEL_MEAN, np.float32) * 255
    std = np.asarray(_Input.PIXEL_STD, np.float32) * 255

    @jax.jit
    def step(p, o, imgs, labels):
        def loss_fn(pp):
            logits = core.rpo_logits(pp, frozen, task, imgs)
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1)), logits

        (loss, logits), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        p, o = sgd_update(p, g, o, 0.02)
        return p, o, loss, logits

    random.seed(0)
    accs = []
    for epoch in range(20):
        correct = total = 0
        for batch in loader:
            imgs = jnp.asarray((batch["img"].astype(np.float32) - mean) / std)
            labels = jnp.asarray(batch["label"])
            prompts, opt, loss, logits = step(prompts, opt, imgs, labels)
            n = batch["n"]
            correct += int((np.asarray(logits).argmax(-1)[:n] == batch["label"][:n]).sum())
            total += n
        accs.append(correct / total)
    # chance = 25%; a learnable task must be (nearly) solved
    assert accs[-1] >= 0.9, accs
    assert accs[-1] > accs[0]
