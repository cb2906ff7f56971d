"""Tensor parallelism over a 2-D (data x model) device mesh.

The reference has no model-parallel story at all (its only parallelism is
single-process ``nn.DataParallel``, /root/reference/trainers/rpo.py:282-285);
data parallelism (dp.py) already covers every throughput-bound workload
here, since the batch dimension shards with ZERO per-layer collectives.
Tensor parallelism exists for the one regime DP cannot touch:
**latency-bound serving at batch < n_devices** (e.g. batch-1 eval of a
big backbone), where the only way to use more chips is to split the
model math itself.

Design — Megatron-style head/hidden sharding, expressed the TPU way:
no manual collectives, no torch-style sliced weight modules.  The tower
code stays the ordinary single-device formulation; a trace-time scope
(``tensor_parallel_scope``) makes the shared projection helpers in
``ops/attention.py`` / ``models/clip/layers.py`` drop
``with_sharding_constraint`` annotations on exactly two activation
families:

  - attention head layout (B, H, L, Dh): sharded over ``model`` on H —
    each device computes H/tp heads end to end; the out-projection
    contracts the sharded head axis, so GSPMD inserts ONE all-reduce per
    attention block;
  - MLP hidden (B, L, 4W): sharded over ``model`` on the last dim — fc
    is partitioned on its output dim, QuickGELU is local, the down-
    projection contracts the sharded dim: ONE all-reduce per MLP.

GSPMD propagates everything else (weight slices stay local reads of the
replicated pytree; residual adds are replicated).  That is the canonical
2-collectives-per-layer tensor-parallel schedule, derived by the
compiler from two annotations instead of hand-written NCCL calls.

The Pallas kernels carry no GSPMD partitioning rules, so the scope
force-disables the Pallas attention path for ops traced inside it (the
XLA lowering is what the partitioner knows how to split).
"""
from __future__ import annotations

import contextlib
import threading
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_TLS = threading.local()


def make_mesh_2d(
    devices: Optional[Sequence] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    axis_names=("data", "model"),
) -> Mesh:
    """(dp x tp) mesh. Give either factor; the other is inferred.  On a
    real slice the devices arrive in ICI-topology order, so adjacent tp
    groups ride the fastest links."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and tp is None:
        dp, tp = 1, n
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    return Mesh(np.asarray(devices).reshape(dp, tp), axis_names)


def current_tp_scope():
    """(mesh, axis) when tracing under tensor_parallel_scope, else None."""
    return getattr(_TLS, "ctx", None)


@contextlib.contextmanager
def tensor_parallel_scope(mesh: Mesh, axis: str = "model"):
    """Ops traced inside the scope (by this thread) emit the TP sharding
    constraints.  Like the Pallas scope, this is read at TRACE time —
    wrap the traced function body, not the call site of a cached jit."""
    prev = getattr(_TLS, "ctx", None)
    _TLS.ctx = (mesh, axis)
    try:
        yield
    finally:
        _TLS.ctx = prev


def shard_heads(x: jax.Array) -> jax.Array:
    """Constrain a (B, H, L, Dh) head-layout activation to be sharded
    over the model axis on H.  No-op outside the scope, or when H does
    not divide by the axis (e.g. the paired-head Pallas layout).

    Every other dim is left UNCONSTRAINED — pinning them (even to None)
    would force the batch dim replicated, and on a dp x tp mesh GSPMD
    then falls back to an involuntary full rematerialization
    (replicate-then-reshard) of the activation at every constraint.
    Unconstrained, the batch keeps its "data" sharding from the input."""
    ctx = current_tp_scope()
    if ctx is None:
        return x
    mesh, axis = ctx
    tp = mesh.shape[axis]
    if x.ndim < 4 or x.shape[1] % tp != 0:
        return x
    spec = P(P.UNCONSTRAINED, axis, *([P.UNCONSTRAINED] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def shard_hidden(x: jax.Array) -> jax.Array:
    """Constrain an MLP hidden activation (..., 4W) to be sharded over
    the model axis on its last dim."""
    ctx = current_tp_scope()
    if ctx is None:
        return x
    mesh, axis = ctx
    tp = mesh.shape[axis]
    if x.shape[-1] % tp != 0:
        return x
    spec = P(*([P.UNCONSTRAINED] * (x.ndim - 1) + [axis]))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


# ---------------------------------------------------------------------------
# step compilers (mirror dp.py's signatures; batch over "data", model math
# over "model", state/backbone replicated)
# ---------------------------------------------------------------------------


def _rep(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _batch(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_eval_step_tp(eval_step, mesh: Mesh):
    """eval_step(params, frozen, text_f, images) -> logits under dp x tp:
    the image batch shards over "data", the tower math over "model"."""

    def wrapped(params, frozen, text_f, images):
        with tensor_parallel_scope(mesh):
            return eval_step(params, frozen, text_f, images)

    rep, shard = _rep(mesh), _batch(mesh)
    return jax.jit(
        wrapped,
        in_shardings=(rep, rep, rep, shard),
        out_shardings=shard,
    )


_WARNED_SINGLE_DEVICE: set = set()


def resolve_tp(cfg) -> int:
    """The model-axis size from ``cfg.TRAIN.TENSOR_PARALLEL``, validated
    against the visible devices.  0 = tensor parallelism off (including
    tp=1, where the knob is meaningless).  A requested tp that cannot be
    satisfied is never silent: indivisible counts raise; a single visible
    device warns loudly once PER REQUESTED VALUE (so a long-lived sweep
    process warns for each distinct config rather than only the first —
    the run proceeds single-device; the same config must stay runnable on
    a 1-chip host), since a quietly-ignored knob in the latency-bound
    serving regime masks a broken topology."""
    tp = int(getattr(cfg.TRAIN, "TENSOR_PARALLEL", 0) or 0)
    n = jax.device_count()
    if tp < 2:
        return 0
    if n < 2:
        if tp not in _WARNED_SINGLE_DEVICE:
            _WARNED_SINGLE_DEVICE.add(tp)
            print(
                f"(!) TRAIN.TENSOR_PARALLEL={tp} requested but only {n} "
                "device is visible — tensor parallelism disabled, running "
                "single-device"
            )
        return 0
    if n % tp != 0:
        raise ValueError(
            f"TRAIN.TENSOR_PARALLEL={tp} does not divide the "
            f"{n} visible devices"
        )
    return tp


def setup_tp_mesh(cfg):
    """Resolve ``TRAIN.TENSOR_PARALLEL`` and build the production dp x tp
    mesh, printing the mesh line the CLI tests pin.  Returns
    ``(mesh, dp, tp)``, or ``None`` when tensor parallelism is off — the
    single source for the trainer/zsclip mesh-setup sequence."""
    tp = resolve_tp(cfg)
    if not tp:
        return None
    n = jax.device_count()
    dp = n // tp
    print(
        f"Multiple devices detected (n={n}), tensor-parallel "
        f"mesh over ICI (dp={dp} x tp={tp})"
    )
    return make_mesh_2d(dp=dp, tp=tp), dp, tp


def data_axis_size(cfg) -> int:
    """Devices along the batch-sharded axis: device_count / tp.  Loader
    batch padding must divide by THIS, not the raw device count."""
    tp = resolve_tp(cfg)
    return jax.device_count() // tp if tp else jax.device_count()


def shard_train_step_tp(train_step, mesh: Mesh, donate: bool = True):
    """train_step(params, opt_state, frozen, images, labels, mask, lr)
    under dp x tp (same contract as dp.shard_train_step)."""

    def wrapped(params, opt_state, frozen, images, labels, mask, lr):
        with tensor_parallel_scope(mesh):
            return train_step(params, opt_state, frozen, images, labels, mask, lr)

    rep, shard = _rep(mesh), _batch(mesh)
    return jax.jit(
        wrapped,
        in_shardings=(rep, rep, rep, shard, shard, shard, rep),
        out_shardings=rep,
        donate_argnums=(0, 1) if donate else (),
    )


def shard_multi_step_tp(multi_step, mesh: Mesh, donate: bool = True):
    """multi_step(params, opt_state, frozen, imgs[G], labels[G], mask[G],
    lr) under dp x tp: batch-group args sharded over "data" on axis 1
    (same contract as dp.shard_multi_step)."""

    def wrapped(params, opt_state, frozen, imgs_g, labels_g, mask_g, lr):
        with tensor_parallel_scope(mesh):
            return multi_step(params, opt_state, frozen, imgs_g, labels_g, mask_g, lr)

    rep = _rep(mesh)
    shard_g = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        wrapped,
        in_shardings=(rep, rep, rep, shard_g, shard_g, shard_g, rep),
        out_shardings=rep,
        donate_argnums=(0, 1) if donate else (),
    )
