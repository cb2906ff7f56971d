"""CoOp / CoCoOp / LP parity vs the actual reference implementations."""
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpo_tpu.methods import cocoop as jcocoop
from rpo_tpu.methods import coop as jcoop
from rpo_tpu.methods import linear_probe as jlp

from .oracle import load_reference_module, make_small_torch_clip

torch = pytest.importorskip("torch")

CLASSNAMES = ["golden retriever", "tabby cat", "sports_car", "daisy", "oak tree"]
N_CTX = 4


@pytest.fixture(scope="module")
def small_clip():
    return make_small_torch_clip(seed=0)


@pytest.fixture(scope="module")
def ref_coop():
    return load_reference_module("/root/reference/trainers/coop.py", "_ref_coop")


def _coop_cfg(position="end", csc=False, ctx_init=""):
    return types.SimpleNamespace(
        TRAINER=types.SimpleNamespace(
            COOP=types.SimpleNamespace(
                N_CTX=N_CTX, CTX_INIT=ctx_init, CSC=csc,
                CLASS_TOKEN_POSITION=position, PREC="fp32",
            ),
            COCOOP=types.SimpleNamespace(N_CTX=N_CTX, CTX_INIT=ctx_init, PREC="fp32"),
            LP=types.SimpleNamespace(PREC="fp32", PROMPT="A photo of a {cls_name}"),
        ),
        INPUT=types.SimpleNamespace(SIZE=(32, 32)),
    )


@pytest.mark.parametrize("position", ["end", "middle", "front"])
@pytest.mark.parametrize("csc", [False, True])
def test_coop_logits_and_grad_parity(small_clip, ref_coop, position, csc):
    model, params, cfg = small_clip
    torch.manual_seed(1)
    ref_model = ref_coop.CustomCLIP(_coop_cfg(position, csc), CLASSNAMES, model)
    ref_model = ref_model.float().eval()

    task = jcoop.make_task(
        cfg, CLASSNAMES, N_CTX, csc, position, " ".join(["X"] * N_CTX)
    )
    np.testing.assert_array_equal(
        task.text_tokens, ref_model.tokenized_prompts.numpy().astype(np.int32)
    )
    jparams = {"ctx": jnp.asarray(ref_model.prompt_learner.ctx.detach().numpy())}

    rng = np.random.RandomState(0)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    labels = np.array([0, 3])

    ref_model.zero_grad()
    ref_logits = ref_model(torch.from_numpy(imgs).permute(0, 3, 1, 2))
    loss_t = torch.nn.functional.cross_entropy(
        ref_logits, torch.from_numpy(labels)
    )
    loss_t.backward()
    ref_grad = ref_model.prompt_learner.ctx.grad.numpy()

    def loss_fn(p):
        logits = jcoop.coop_logits(p, params, task, jnp.asarray(imgs))
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.take_along_axis(logp, jnp.asarray(labels)[:, None], 1)), logits

    (loss_j, logits_j), grads = jax.value_and_grad(loss_fn, has_aux=True)(jparams)
    np.testing.assert_allclose(
        np.asarray(logits_j), ref_logits.detach().numpy(), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(grads["ctx"]), ref_grad, rtol=5e-3, atol=1e-5)


def test_coop_ctx_init_from_words(small_clip):
    _, params, cfg = small_clip
    jparams, prefix, n_ctx = jcoop.init_ctx(
        jax.random.PRNGKey(0), params, cfg, len(CLASSNAMES), 16, False,
        "a photo of a",
    )
    assert prefix == "a photo of a"
    assert n_ctx == 4


def test_lp_torch_checkpoint_remap():
    """LP accepts the reference's lp_layer state ({'weight': (out,in),
    'bias'}, applied as x @ W.T + b) by transposing into our
    {'w': (in,out), 'b'} (applied as x @ w + b)."""
    from rpo_tpu.methods.linear_probe import LP

    rng = np.random.RandomState(0)
    W = rng.randn(6, 6).astype(np.float32)  # torch (out, in), not symmetric
    b = rng.randn(6).astype(np.float32)
    tr = object.__new__(LP)
    tr.set_ckpt_state("lp_layer", {"weight": W, "bias": b})
    x = rng.randn(3, 6).astype(np.float32)
    ours = x @ np.asarray(tr.params["w"]) + np.asarray(tr.params["b"])
    torch_ref = x @ W.T + b
    np.testing.assert_allclose(ours, torch_ref, rtol=1e-6)
    # native-format checkpoints pass through untouched
    tr.set_ckpt_state("lp_layer", {"w": W.T, "b": b})
    np.testing.assert_allclose(np.asarray(tr.params["w"]), W.T)


def test_coop_ctx_init_with_csc_stays_shared(small_clip):
    """The reference applies CSC only to the random-init branch
    (coop.py:72-89): with CTX_INIT set, ctx is a single shared
    (n_ctx, d) tensor even when CSC=True."""
    _, params, cfg = small_clip
    jparams, _, n_ctx = jcoop.init_ctx(
        jax.random.PRNGKey(0), params, cfg, len(CLASSNAMES), 16, True,
        "a photo of a",
    )
    assert jparams["ctx"].shape == (n_ctx, cfg.text_width)
    # random branch DOES honor CSC
    jparams2, _, _ = jcoop.init_ctx(
        jax.random.PRNGKey(0), params, cfg, len(CLASSNAMES), 4, True, ""
    )
    assert jparams2["ctx"].shape == (len(CLASSNAMES), 4, cfg.text_width)
    # rows are the embeddings of tokens "a photo of a"
    from rpo_tpu.tokenizer import tokenize

    ids = tokenize("a photo of a")[0, 1:5]
    expect = np.asarray(params["text"]["token_embedding"])[ids]
    np.testing.assert_allclose(np.asarray(jparams["ctx"]), expect, rtol=1e-6)


def test_cocoop_logits_and_grad_parity(small_clip):
    model, params, cfg = small_clip
    ref_cocoop = load_reference_module(
        "/root/reference/trainers/cocoop.py", "_ref_cocoop"
    )
    torch.manual_seed(2)
    ref_model = ref_cocoop.CustomCLIP(_coop_cfg(), CLASSNAMES, model).float().eval()

    task = jcoop.make_task(
        cfg, CLASSNAMES, N_CTX, False, "end", " ".join(["X"] * N_CTX)
    )
    pl = ref_model.prompt_learner
    jparams = {
        "ctx": jnp.asarray(pl.ctx.detach().numpy()),
        "meta_net": {
            "w1": jnp.asarray(pl.meta_net.linear1.weight.detach().numpy().T),
            "b1": jnp.asarray(pl.meta_net.linear1.bias.detach().numpy()),
            "w2": jnp.asarray(pl.meta_net.linear2.weight.detach().numpy().T),
            "b2": jnp.asarray(pl.meta_net.linear2.bias.detach().numpy()),
        },
    }

    rng = np.random.RandomState(3)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    labels = np.array([1, 4])

    pl.train()  # training flag -> model returns CE loss
    ref_model.zero_grad()
    loss_t = ref_model(
        torch.from_numpy(imgs).permute(0, 3, 1, 2), torch.from_numpy(labels)
    )
    loss_t.backward()
    ref_gctx = pl.ctx.grad.numpy()
    pl.eval()
    with torch.no_grad():
        ref_logits = ref_model(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()

    def loss_fn(p):
        logits = jcocoop.cocoop_logits(p, params, task, jnp.asarray(imgs))
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.take_along_axis(logp, jnp.asarray(labels)[:, None], 1)), logits

    (loss_j, logits_j), grads = jax.value_and_grad(loss_fn, has_aux=True)(jparams)
    np.testing.assert_allclose(np.asarray(logits_j), ref_logits, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(grads["ctx"]), ref_gctx, rtol=5e-3, atol=1e-5)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))


def test_lp_logits_parity(small_clip):
    model, params, cfg = small_clip
    lp_cfg = _coop_cfg()
    # The reference hardcodes eye(512) and only works at ViT-B/16 dims;
    # compare against its math (identity LP == raw image features).
    prompts = [lp_cfg.TRAINER.LP.PROMPT.format(cls_name=c) for c in CLASSNAMES]
    from rpo_tpu.models.clip import encode_text
    from rpo_tpu.tokenizer import tokenize

    tokens = jnp.asarray(tokenize(prompts))
    text_f = encode_text(params, cfg, tokens).astype(jnp.float32)
    text_f = text_f / jnp.linalg.norm(text_f, axis=-1, keepdims=True)

    with torch.no_grad():
        ref_tf = model.encode_text(torch.from_numpy(np.asarray(tokenize(prompts), np.int64)))
        ref_tf = ref_tf / ref_tf.norm(dim=-1, keepdim=True)
    np.testing.assert_allclose(np.asarray(text_f), ref_tf.numpy(), rtol=2e-3, atol=2e-3)

    rng = np.random.RandomState(4)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    d = cfg.embed_dim
    jparams = {"w": jnp.eye(d), "b": jnp.zeros((d,))}
    ours = jlp.lp_logits(jparams, params, cfg, text_f, jnp.asarray(imgs))
    with torch.no_grad():
        imf = model.encode_image(torch.from_numpy(imgs).permute(0, 3, 1, 2))
        ref_logits = model.logit_scale.exp() * imf @ ref_tf.t()
    # identity LP == raw unnormalized image features @ text_f
    np.testing.assert_allclose(
        np.asarray(ours), ref_logits.numpy(), rtol=2e-3, atol=2e-3
    )


@pytest.mark.parametrize("position", ["end", "middle", "front"])
def test_text_truncation_exact(small_clip, position):
    """CoOpTask.text_len truncation is exact: under the causal mask,
    positions past the longest EOT never influence the gathered EOT
    outputs (reference runs all 77 and discards them, coop.py:46-57)."""
    import dataclasses

    model, params, cfg = small_clip
    task = jcoop.make_task(cfg, CLASSNAMES, N_CTX, False, position, "a photo of a")
    assert task.text_len < cfg.context_length  # the test prompts are short
    assert task.text_len % 8 == 0
    full_task = dataclasses.replace(task, text_len=cfg.context_length)

    key = jax.random.PRNGKey(7)
    ctx = {"ctx": jax.random.normal(key, (N_CTX, cfg.text_width), jnp.float32) * 0.02}
    tf_trunc = np.asarray(jcoop.coop_text_features(ctx, params, task))
    tf_full = np.asarray(jcoop.coop_text_features(ctx, params, full_task))
    np.testing.assert_allclose(tf_trunc, tf_full, rtol=1e-5, atol=1e-5)


def test_cocoop_truncation_exact(small_clip):
    import dataclasses

    model, params, cfg = small_clip
    task = jcoop.make_task(cfg, CLASSNAMES, N_CTX, False, "end", "a photo of a")
    full_task = dataclasses.replace(task, text_len=cfg.context_length)

    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    jparams = {
        "ctx": jax.random.normal(k1, (N_CTX, cfg.text_width), jnp.float32) * 0.02,
        "meta_net": jcocoop.init_meta_net(k2, cfg.embed_dim, cfg.text_width),
    }
    imgs = jnp.asarray(np.random.RandomState(3).randn(2, 32, 32, 3), jnp.float32)
    lt = np.asarray(jcocoop.cocoop_logits(jparams, params, task, imgs))
    lf = np.asarray(jcocoop.cocoop_logits(jparams, params, full_task, imgs))
    np.testing.assert_allclose(lt, lf, rtol=1e-5, atol=1e-4)
