"""rpo_tpu: TPU-native CLIP prompt-learning framework.

A complete reimplementation of the capabilities of mlvlab/RPO (ICCV 2023)
on JAX/XLA/Pallas — see README.md for the layer map and design notes.
"""

__version__ = "0.1.0"
