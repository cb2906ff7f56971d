"""Method trainers. Importing this package registers all trainers
(mirrors the registry side-effect imports at /root/reference/train.py:28-32)."""
from . import rpo_trainer  # noqa: F401

__all__ = ["rpo_trainer"]
