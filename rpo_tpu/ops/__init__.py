from .attention import (
    NEG_INF,
    dot_product_attention,
    multihead_attention,
    pallas_attention_scope,
    set_pallas_attention,
    use_pallas_attention,
)
from .preprocess import (
    batch_crop_flip_normalize,
    device_eval_preprocess,
    resize_bicubic,
)

__all__ = [
    "NEG_INF",
    "batch_crop_flip_normalize",
    "device_eval_preprocess",
    "dot_product_attention",
    "multihead_attention",
    "pallas_attention_scope",
    "resize_bicubic",
    "set_pallas_attention",
    "use_pallas_attention",
]
