"""Method trainers. Importing this package registers all trainers
(mirrors the registry side-effect imports at /root/reference/train.py:28-32)."""
from . import cocoop  # noqa: F401
from . import coop  # noqa: F401
from . import linear_probe  # noqa: F401
from . import rpo_trainer  # noqa: F401
from . import zsclip  # noqa: F401

__all__ = ["cocoop", "coop", "linear_probe", "rpo_trainer", "zsclip"]
