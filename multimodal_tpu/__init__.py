"""multimodal_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multimodal contrastive-learning framework.

A from-scratch rebuild of the capabilities of the ``neskech/Multimodal-2025`` research stack
(see SURVEY.md at the repo root): CLIP-family encoders (two-tower CLIP, single-trunk
SharedCLIP/AlignCLIP, Variational CLIP), contrastive losses (InfoNCE, CLOOB, in-modality
separation, variational spherical), spherical probability distributions, a sharded training
engine over a `jax.sharding.Mesh`, an evaluation suite, and a research toolkit — all designed
TPU-first rather than translated from the reference's PyTorch/CUDA patterns.
"""

__version__ = "0.1.0"
