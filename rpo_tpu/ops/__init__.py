from .attention import (
    NEG_INF,
    dot_product_attention,
    multihead_attention,
    pallas_attention_scope,
    set_pallas_attention,
    use_pallas_attention,
)
from .preprocess import (
    device_eval_preprocess,
    device_train_preprocess,
    resize_bicubic,
)

__all__ = [
    "NEG_INF",
    "device_eval_preprocess",
    "device_train_preprocess",
    "dot_product_attention",
    "multihead_attention",
    "pallas_attention_scope",
    "resize_bicubic",
    "set_pallas_attention",
    "use_pallas_attention",
]
