"""temporalalignnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of TengdaHan/TemporalAlignNet (CVPR'22).

The reference (`/root/reference`) is a PyTorch research codebase that learns video-text
temporal alignment without human annotation.  This framework re-designs it TPU-first:

- models/      Flax modules: TAN dual+joint transformer, word2vec text encoder, S3D.
- ops/         Pallas TPU kernels for the hot paths (fused attention, fused MIL-NCE).
- losses/      Multi-layer MIL-NCE, agreement self-labelling, alignability BCE —
               all fixed-shape, arithmetic-masked, jit-compatible.
- data/        Fixed-shape feature-window pipelines (HTM, HTM-Align, YouCook2, HTM-AA).
- train/       Jitted train step (fwd+loss+grad+EMA in one pjit), optax chains.
- eval/        Vmapped zero-shot HTM-Align aligner and YouCook2 retrieval.
- parallel/    Mesh construction and sharding rules (dp x tp over ICI).
- checkpoint/  Orbax save/restore + one-way torch->pytree converter.
- utils/       Meters, metrics (ROC-AUC), logging.
"""

__version__ = "0.1.0"
