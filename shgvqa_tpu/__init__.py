"""shgvqa_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video question-answering framework.

A ground-up rebuild of the capabilities of SHG-VQA ("Learning Situation
Hyper-Graphs for Video Question Answering", CVPR 2023) designed for TPU:

- data pipeline: frame decode + clip sampling + augmentation feeding device HBM
- a frozen slow_r50 3D-ResNet video backbone (flax)
- LXMERT-style language / visual / cross-modal encoder stack
- DETR-style situation-hypergraph decoders with a fully on-device
  Hungarian-matching set-prediction loss
- AGQA 2.0 / STAR training, evaluation (31-way AGQA metric suite,
  novelComp / compSteps / indirectRef protocols, STAR per-question-type)
- pjit/shard_map scale-out over a device mesh

This is not a port of the PyTorch reference: modules are shape-polymorphic
flax.linen modules, featurization is vectorized numpy feeding static-shape
device buffers, the assignment solver runs under vmap on-device, and the
training step is a single jitted SPMD program.
"""

__version__ = "0.1.0"
