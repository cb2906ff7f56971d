from .config import CfgNode, get_cfg_default
from .evaluator import ClassificationEvaluator
from .logger import setup_logger
from .optim import SGDState, lr_at_epoch, sgd_init, sgd_update
from .registry import DATASET_REGISTRY, TRAINER_REGISTRY, Registry
from .trainer import TrainerBase, build_trainer

__all__ = [
    "CfgNode",
    "ClassificationEvaluator",
    "DATASET_REGISTRY",
    "Registry",
    "SGDState",
    "TRAINER_REGISTRY",
    "TrainerBase",
    "build_trainer",
    "get_cfg_default",
    "lr_at_epoch",
    "setup_logger",
    "sgd_init",
    "sgd_update",
]
