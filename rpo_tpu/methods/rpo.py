"""RPO: Read-only Prompt Optimization (ICCV 2023) — TPU-native core.

Behavior contract: /root/reference/trainers/rpo.py:41-232.  The method
learns K text-prompt vectors (K, d_t) and K visual-prompt vectors (K, d_v)
injected into a frozen CLIP under *asymmetric read-only attention masks*:
prompts read the frozen tokens; frozen tokens (and other prompts, and the
prompt itself) never read the prompts.

TPU-first reformulation (SURVEY.md §7):
  - The reference's per-K Python loops (rpo.py:176-177, 186-189, 222-227)
    become one vectorized scatter, one gather, and one einsum.
  - The torch (n_cls*heads, 77, 77) mask becomes a (n_cls, 1, 77, 77)
    additive bias; the vision mask (1, 1, S, S).  Both are static per task
    and baked at jit time.
  - Gradients flow only to the prompt pytree by construction:
    ``jax.grad(loss)(prompts, frozen, batch)`` — no requires_grad
    machinery (frozen backbone falls out of functional differentiation).
  - Trainable prompts are kept in float32 (master copy) and cast to the
    compute dtype inside the forward.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rpo_tpu.models.clip import CLIPConfig
from rpo_tpu.models.clip.layers import (
    cross_residual_block,
    layer_norm,
    rect_residual_block,
    residual_block_kv,
)
from rpo_tpu.models.clip.model import (
    causal_mask,
    text_transformer_run,
    vision_embed,
)
from rpo_tpu.ops.attention import NEG_INF
from rpo_tpu.tokenizer import EOT_TOKEN, tokenize

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# masks (host-side, static per task) — truth table at rpo.py:140-159
# ---------------------------------------------------------------------------

def build_text_mask(len_prompts: np.ndarray, context_length: int = 77) -> np.ndarray:
    """(n_cls, 1, L, L) float32 additive bias.

    Per class c with idx = #real tokens (incl. EOT):
      col >= idx           -> masked (frozen tokens never see prompts/pads;
                              a prompt sees neither itself nor other prompts)
      col >  row (causal)  -> masked
      otherwise            -> visible
    Matches rpo.py:144-151 exactly (the column rule overwrites causal).
    """
    L = context_length
    rows = np.arange(L)[:, None]
    cols = np.arange(L)[None, :]
    causal = cols > rows  # (L, L)
    idx = np.asarray(len_prompts).reshape(-1, 1, 1)  # (n_cls, 1, 1)
    blocked = causal[None] | (cols[None] >= idx)  # (n_cls, L, L)
    return np.where(blocked, NEG_INF, 0.0).astype(np.float32)[:, None]


def build_prompt_col_mask(len_prompts: np.ndarray, kv_len: int) -> np.ndarray:
    """(n_cls, 1, 1, kv_len) float32 additive bias for the cached-KV fast
    path: prompt rows of class c may read only the frozen columns
    ``col < len_prompts[c]`` (rpo.py:144-151 — the ``mask[:, idx:]``
    column rule; causal is vacuous for prompt rows since every visible
    column precedes them)."""
    cols = np.arange(kv_len)[None, :]
    blocked = cols >= np.asarray(len_prompts)[:, None]
    return np.where(blocked, NEG_INF, 0.0).astype(np.float32)[:, None, None, :]


def build_visual_mask(seq_len: int, K: int) -> np.ndarray:
    """(1, 1, S, S) float32: last K columns masked for every row
    (rpo.py:153-159) — visual prompts are appended after CLS+patches and
    are invisible to everything, including themselves."""
    mask = np.zeros((seq_len, seq_len), dtype=np.float32)
    mask[:, seq_len - K :] = NEG_INF
    return mask[None, None]


# ---------------------------------------------------------------------------
# task construction (host-side)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class RPOTask:
    """Static per-(dataset, class-subset) state closed over at jit time.

    ``prompt_onehot[c, p, i] = 1`` iff position p of class c's sequence is
    prompt slot i (p == len_prompts[c] + i).  Prompt injection and output
    extraction are one-hot einsums instead of scatter/gather: scatters
    with 2D advanced indices take *minutes* to compile on the TPU backend
    (measured 317s vs 25s for the whole tower) and lower poorly, while
    one-hot contractions ride the MXU and differentiate cleanly.
    """

    cfg: CLIPConfig
    K: int
    n_cls: int
    text_tokens: np.ndarray  # (n_cls, 77) int32
    len_prompts: np.ndarray  # (n_cls,) int32 — #real tokens incl. EOT
    text_mask: np.ndarray  # (n_cls, 1, 77, 77) f32
    visual_mask: np.ndarray  # (1, 1, S, S) f32
    prompt_onehot: np.ndarray  # (n_cls, 77, K) f32


def make_task(cfg: CLIPConfig, classnames, prompt_template: str, K: int) -> RPOTask:
    """Tokenize per-class prompts and build masks (rpo.py:132-159).

    prompt_template uses '_' as the classname slot, e.g. "a photo of a _."
    (cfg.DATASET.PROMPT in every reference dataset yaml).
    """
    if K < 1:
        raise ValueError("K should be bigger than 0")  # rpo.py:47 (assert)
    prompts = [prompt_template.replace("_", c) for c in classnames]
    # tokenize at the MODEL's context length: convert.py infers it from
    # positional_embedding, so a non-77 checkpoint must shape every
    # length-dependent artifact below consistently
    tokens = tokenize(prompts, cfg.context_length)
    len_prompts = tokens.argmax(axis=-1).astype(np.int32) + 1
    if int((len_prompts + K).max()) > cfg.context_length:
        raise ValueError(
            f"K={K} prompt tokens do not fit after the longest classname "
            f"(max len {int(len_prompts.max())}, context {cfg.context_length})"
        )
    seq_len = cfg.vision_seq_len + K
    n_cls = len(classnames)
    positions = np.arange(cfg.context_length)[None, :, None]  # (1, 77, 1)
    slots = len_prompts[:, None, None] + np.arange(K)[None, None, :]  # (n_cls, 1, K)
    prompt_onehot = (positions == slots).astype(np.float32)  # (n_cls, 77, K)
    return RPOTask(
        cfg=cfg,
        K=K,
        n_cls=n_cls,
        text_tokens=tokens,
        len_prompts=len_prompts,
        text_mask=build_text_mask(len_prompts, cfg.context_length),
        visual_mask=build_visual_mask(seq_len, K),
        prompt_onehot=prompt_onehot,
    )


# ---------------------------------------------------------------------------
# prompt params
# ---------------------------------------------------------------------------

def init_prompts(key: jax.Array, clip_params: Params, cfg: CLIPConfig, K: int) -> Params:
    """EOT/CLS embedding + 0.1 * L2-normalized Gaussian noise
    (rpo.py:60-88).  Returned in float32 (training master copy)."""
    kt, kv = jax.random.split(key)
    vocab = clip_params["text"]["token_embedding"].shape[0]
    if EOT_TOKEN >= vocab:
        # jnp indexing CLAMPS out-of-bounds: a trimmed-vocab checkpoint
        # would silently init from an arbitrary row without this check
        raise ValueError(f"EOT token {EOT_TOKEN} out of vocab ({vocab})")
    eot_emb = clip_params["text"]["token_embedding"][EOT_TOKEN].astype(jnp.float32)
    tn = jax.random.normal(kt, (K, cfg.text_width), jnp.float32)
    tn = tn / jnp.linalg.norm(tn, axis=-1, keepdims=True)
    text_prompt = eot_emb[None, :] + 0.1 * tn

    cls_emb = clip_params["visual"]["class_embedding"].astype(jnp.float32)
    vn = jax.random.normal(kv, (K, cfg.vision_width), jnp.float32)
    vn = vn / jnp.linalg.norm(vn, axis=-1, keepdims=True)
    img_prompt = cls_emb[None, :] + 0.1 * vn
    return {"text_prompt": text_prompt, "img_prompt": img_prompt}


def precompute_text_x(clip_params: Params, task: RPOTask) -> jax.Array:
    """Frozen embedded class prompts + positional (rpo.py:136): the text
    tower input before prompt scatter.  Computed once per task."""
    t = clip_params["text"]
    emb = t["token_embedding"][jnp.asarray(task.text_tokens)]
    return emb + t["positional_embedding"].astype(emb.dtype)


def _frozen_text_kv_impl(text_params, text_x, bias, n_heads: int, kv_len: int):
    """Run the frozen text tower under the plain causal mask, collecting
    each layer's (k, v) heads truncated to the first kv_len columns."""

    def step(x, p):
        x, k, v = residual_block_kv(x, p, n_heads, bias)
        return x, (k[:, :, :kv_len], v[:, :, :kv_len])

    _, (ks, vs) = jax.lax.scan(step, text_x, text_params["blocks"])
    return ks, vs  # (L_layers, n_cls, H, kv_len, Dh)


_frozen_text_kv = jax.jit(
    _frozen_text_kv_impl, static_argnames=("n_heads", "kv_len")
)


def precompute_text_kv(clip_params: Params, task: RPOTask) -> Dict[str, jax.Array]:
    """Per-layer frozen-text K/V — the RPO read-only-mask algebraic win.

    The reference text mask blocks every column >= idx_c for every row
    (/root/reference/trainers/rpo.py:144-151), so (a) frozen-token rows
    see exactly the vanilla causal context — their activations at every
    layer are independent of the K learnable prompts — and (b) prompt
    rows read only frozen columns, never themselves or each other.
    Hence each layer's frozen K/V can be computed ONCE per task and every
    training step only has to push the K prompt rows per class through
    the tower (q-projection + cross-attention + MLP): ~77/K fewer text
    rows per step at identical math.

    Returns {"k", "v"}: (L_layers, n_cls, H, T, Dh) with
    T = max(len_prompts) — columns beyond the longest real sequence are
    masked for every class and never read.
    """
    cfg = task.cfg
    t = clip_params["text"]
    text_x = precompute_text_x(clip_params, task)
    bias = causal_mask(cfg.context_length)[None, None]
    kv_len = int(task.len_prompts.max())
    k, v = _frozen_text_kv(t, text_x, bias, cfg.text_heads, kv_len)
    return {"k": k, "v": v}


def make_frozen(
    clip_params: Params, task: RPOTask, cache_text_kv: bool = True
) -> Params:
    """Bundle every non-trainable tensor a jitted RPO step touches.

    This bundle must be passed as a jit ARGUMENT (never closed over):
    jax embeds closure arrays into the compiled HLO as literal constants
    — for the ~300MB CLIP pytree that meant gigabyte executables and
    200-350s compiles (measured on TPU v5e) vs seconds as parameters.

    cache_text_kv=True adds the per-layer frozen-text K/V cache (see
    precompute_text_kv) which switches encode_text_with_prompts to the
    prompt-rows-only fast path.
    """
    bundle = {"clip": clip_params}
    if cache_text_kv:
        kv = precompute_text_kv(clip_params, task)
        bundle["text_kv"] = kv
        bundle["prompt_col_mask"] = jnp.asarray(
            build_prompt_col_mask(task.len_prompts, kv["k"].shape[-2])
        )
    else:
        # only the masked text formulation reads these; with the KV cache
        # they are dead weight shipped through the slow host->device
        # tunnel and held replicated per device (at n_cls=1000: text_mask
        # ~24MB f32, text_x ~79MB bf16, prompt_onehot ~7MB).  The vision
        # masks are never bundled: eval uses the rect tower and training
        # the split tower, neither of which materializes a bias.
        bundle["text_x"] = precompute_text_x(clip_params, task)
        bundle["prompt_onehot"] = jnp.asarray(task.prompt_onehot)
        bundle["text_mask"] = jnp.asarray(task.text_mask)
    return bundle


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _as_frozen(frozen_or_clip: Params, task: RPOTask) -> Params:
    """Accept either a make_frozen() bundle or bare clip params (test
    convenience — bare params rebuild the bundle in-trace, without the
    KV cache: precomputing it inside a traced step would defeat it)."""
    if "clip" in frozen_or_clip:
        return frozen_or_clip
    return make_frozen(frozen_or_clip, task, cache_text_kv=False)


def _maybe_remat_scan_body(body):
    """Optional rematerialization of the tower scan bodies, read at TRACE
    time from $RPO_TPU_SCAN_REMAT:

      "dots" — jax.checkpoint with the dots_saveable policy: the backward
               recomputes everything EXCEPT matmul outputs, eliminating
               the fp32 layer-norm/softmax residual stashes the profiler
               shows as per-layer HBM traffic (BASELINE.md round-3 op
               table) at the cost of recomputing cheap VPU work;
      "full" — plain jax.checkpoint (recompute the whole layer).

    Unset (default) leaves the body untouched.  Kept as an env knob, not
    a default: measured on TPU v5e (same-process A/B, BASELINE.md)."""
    mode = os.environ.get("RPO_TPU_SCAN_REMAT", "")
    if mode == "dots":
        return jax.checkpoint(body, policy=jax.checkpoint_policies.dots_saveable)
    if mode == "full":
        return jax.checkpoint(body)
    return body


def encode_text_prompts_cached(
    prompts: Params, frozen: Params, task: RPOTask
) -> jax.Array:
    """Fast text path: push ONLY the K prompt rows per class through the
    tower, cross-attending each layer to the precomputed frozen K/V.

    Exactly equal (up to reduction order) to encode_text_with_prompts:
    prompt rows never produce keys/values any other row may read, and
    frozen rows never read prompt columns (see precompute_text_kv).
    Prompt vectors REPLACE the embedded tokens at their positions in the
    reference (rpo.py:175-177) so they carry no positional embedding —
    the initial row state is the raw prompt vector, identical across
    classes.
    """
    cfg = task.cfg
    t = frozen["clip"]["text"]
    kv = frozen["text_kv"]
    bias = frozen["prompt_col_mask"]
    dtype = kv["k"].dtype
    tp = prompts["text_prompt"].astype(dtype)  # (K, d_t)
    x = jnp.broadcast_to(tp[None], (task.n_cls, task.K, cfg.text_width))

    def step(x, inputs):
        p, k, v = inputs
        return cross_residual_block(x, k, v, p, cfg.text_heads, bias), None

    x, _ = jax.lax.scan(_maybe_remat_scan_body(step), x, (t["blocks"], kv["k"], kv["v"]))
    x = layer_norm(x, t["ln_final"])  # (n_cls, K, d_t) — rows ARE the prompts
    return jnp.einsum(
        "ckd,de->cke", x, t["text_projection"], preferred_element_type=jnp.float32
    ).astype(dtype)


def encode_text_with_prompts(
    prompts: Params,
    frozen: Params,
    task: RPOTask,
    text_x: Optional[jax.Array] = None,
) -> jax.Array:
    """Masked text tower -> prompt-position features (n_cls, K, embed).

    When the frozen bundle carries the per-task KV cache (make_frozen
    default) and no text_x override is given, dispatches to the
    prompt-rows-only fast path."""
    frozen = _as_frozen(frozen, task)
    if text_x is None and "text_kv" in frozen:
        return encode_text_prompts_cached(prompts, frozen, task)
    cfg = task.cfg
    t = frozen["clip"]["text"]
    if text_x is None:
        text_x = frozen["text_x"]
    dtype = text_x.dtype

    # One-hot injection of the K learnable prompts at per-class positions
    # (replaces the reference's in-place scatter loop, rpo.py:176-177;
    # one-hot contractions ride the MXU and differentiate cleanly).
    # Bundled only in cache_text_kv=False mode; a KV-cached bundle driven
    # through here (explicit text_x override) embeds the task constant.
    onehot = frozen.get("prompt_onehot")
    if onehot is None:
        onehot = jnp.asarray(task.prompt_onehot)
    onehot = onehot.astype(dtype)  # (n_cls, 77, K)
    tp = prompts["text_prompt"].astype(dtype)  # (K, d_t)
    is_prompt = jnp.sum(onehot, axis=-1, keepdims=True)  # (n_cls, 77, 1) 0/1
    injected = jnp.einsum("cpk,kd->cpd", onehot, tp)
    x = text_x * (1.0 - is_prompt).astype(dtype) + injected

    # the bundle carries the mask only in cache_text_kv=False mode; a
    # KV-cached bundle driven through the masked path (explicit text_x
    # override) embeds it as a trace constant instead
    text_mask = frozen.get("text_mask")
    if text_mask is None:
        text_mask = jnp.asarray(task.text_mask)
    x = text_transformer_run(t, cfg, x, text_mask)
    x = layer_norm(x, t["ln_final"])

    # One-hot extraction of the K prompt outputs (replaces rpo.py:186-189).
    feats = jnp.einsum("cpk,cpd->ckd", onehot.astype(x.dtype), x)  # (n_cls, K, d_t)
    return jnp.einsum(
        "ckd,de->cke", feats, t["text_projection"], preferred_element_type=jnp.float32
    ).astype(dtype)


def encode_image_with_prompts(
    prompts: Params, frozen: Params, task: RPOTask, images: jax.Array
) -> jax.Array:
    """Masked vision tower -> appended-prompt features (B, K, embed).

    The eval-path formulation: one joint pass per layer over
    cls+patches+prompts where keys/values come only from the frozen rows
    (rect_residual_block).  Exactly the reference's masked self-attention
    — the visual mask blocks the K prompt columns for every row
    (rpo.py:153-159), so the masked K/V are never read; here they are
    never computed and no (S, S) bias is materialized.  Measured
    bit-identical logits and ~7% faster than the fused masked tower on
    TPU v5e at batch 100.
    """
    frozen = _as_frozen(frozen, task)
    cfg = task.cfg
    v = frozen["clip"]["visual"]
    K = task.K

    x = vision_embed(v, cfg, images)  # (B, 197, d_v) — cls+patches+pos
    dtype = x.dtype
    n_kv = x.shape[1]  # frozen rows: cls + patches
    ip = jnp.broadcast_to(
        prompts["img_prompt"].astype(dtype)[None], (x.shape[0], K, cfg.vision_width)
    )
    x = jnp.concatenate([x, ip], axis=1)  # append prompts (rpo.py:204)
    x = layer_norm(x, v["ln_pre"])

    def step(x, p):
        return rect_residual_block(x, p, cfg.vision_heads, n_kv), None

    x, _ = jax.lax.scan(step, x, v["blocks"])
    feats = layer_norm(x[:, -K:, :], v["ln_post"])  # (B, K, d_v)
    return jnp.einsum(
        "bkd,de->bke", feats, v["proj"], preferred_element_type=jnp.float32
    ).astype(dtype)


def encode_image_prompts_split(
    prompts: Params, frozen: Params, task: RPOTask, images: jax.Array
) -> jax.Array:
    """Training-path vision tower: frozen rows and prompt rows split.

    The visual mask blocks the K prompt columns for EVERY row
    (/root/reference/trainers/rpo.py:153-159), so the cls+patch rows see
    plain unmasked self-attention — their activations at every layer are
    independent of the visual prompts — and prompt rows only cross-attend
    to frozen columns.  Running the 197-row frozen tower under
    stop_gradient and cross-attending the K prompt rows per layer makes
    the prompt-independence STRUCTURAL: reverse-mode AD differentiates
    only the K-row path instead of the full 221-token tower (the additive
    mask is data, not structure — XLA cannot prune the masked backward).
    Same math as encode_image_with_prompts (masked softmax columns carry
    exactly-zero weight); measured 1.38x train step on TPU v5e at batch 4
    and ~10x smaller train program to compile.

    For forward-only eval at large batch the fused masked formulation is
    faster (one big MXU pass per layer) — eval keeps
    encode_image_with_prompts.
    """
    frozen = _as_frozen(frozen, task)
    cfg = task.cfg
    v = frozen["clip"]["visual"]
    K = task.K

    x_f = vision_embed(v, cfg, images)  # (B, 197, d_v)
    x_f = layer_norm(x_f, v["ln_pre"])
    dtype = x_f.dtype
    ip = jnp.broadcast_to(
        prompts["img_prompt"].astype(dtype)[None], (x_f.shape[0], K, cfg.vision_width)
    )
    x_p = layer_norm(ip, v["ln_pre"])

    def step(carry, p):
        x_f, x_p = carry
        x_f_next, k, v_heads = residual_block_kv(x_f, p, cfg.vision_heads, None)
        k = jax.lax.stop_gradient(k)
        v_heads = jax.lax.stop_gradient(v_heads)
        x_p = cross_residual_block(x_p, k, v_heads, p, cfg.vision_heads, None)
        return (jax.lax.stop_gradient(x_f_next), x_p), None

    (_, x_p), _ = jax.lax.scan(_maybe_remat_scan_body(step), (x_f, x_p), v["blocks"])
    feats = layer_norm(x_p, v["ln_post"])  # (B, K, d_v)
    return jnp.einsum(
        "bkd,de->bke", feats, v["proj"], preferred_element_type=jnp.float32
    ).astype(dtype)


def rpo_logits(
    prompts: Params,
    frozen: Params,
    task: RPOTask,
    images: jax.Array,
    text_x: Optional[jax.Array] = None,
    text_f: Optional[jax.Array] = None,
    split_vision: bool = False,
) -> jax.Array:
    """(B, n_cls) classification logits: mean over K prompt pairs of the
    scaled cosine similarity (rpo.py:215-227).

    Pass a precomputed ``text_f`` for evaluation (text tower runs once per
    task, not once per batch — the TPU eval fast path).  ``split_vision``
    selects the training-path vision tower (encode_image_prompts_split);
    rpo_loss enables it by default.
    """
    frozen = _as_frozen(frozen, task)
    if text_f is None:
        text_f = encode_text_with_prompts(prompts, frozen, task, text_x)
    encode_image = (
        encode_image_prompts_split if split_vision else encode_image_with_prompts
    )
    img_f = encode_image(prompts, frozen, task, images)

    text_f = text_f.astype(jnp.float32)
    img_f = img_f.astype(jnp.float32)
    text_f = text_f / jnp.linalg.norm(text_f, axis=-1, keepdims=True)
    img_f = img_f / jnp.linalg.norm(img_f, axis=-1, keepdims=True)
    scale = jnp.exp(frozen["clip"]["logit_scale"].astype(jnp.float32))
    # mean over K of per-pair cosine logits == einsum / K
    return scale * jnp.einsum("bke,cke->bc", img_f, text_f) / task.K


def rpo_loss(
    prompts: Params,
    frozen: Params,
    task: RPOTask,
    images: jax.Array,
    labels: jax.Array,
    text_x: Optional[jax.Array] = None,
    split_vision: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Cross-entropy (rpo.py:229-230); returns (loss, logits).

    Uses the split (gradient-pruned) vision tower by default — the
    training fast path; pass split_vision=False for the fused tower."""
    logits = rpo_logits(
        prompts, frozen, task, images, text_x=text_x, split_vision=split_vision
    )
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(log_probs, labels[:, None], axis=-1))
    return loss, logits
