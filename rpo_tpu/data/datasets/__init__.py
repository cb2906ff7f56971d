"""Dataset classes. Importing this package registers all datasets
(mirrors /root/reference/train.py:11-26)."""
from . import synthetic  # noqa: F401
