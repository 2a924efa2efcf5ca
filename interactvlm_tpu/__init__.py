"""InteractVLM-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
estimating 3D contact on human bodies and objects from a single 2D image.

Rebuilt from scratch with the capabilities of the reference
(saidwivedi/InteractVLM, CVPR 2025) but designed TPU-first:

- ``geometry``: batched XLA rasterization, pixel->vertex lift maps, and the
  2D->3D contact lifting as ``segment_sum`` scatter (replaces PyTorch3D +
  per-sample torch loops).
- ``ops``: Pallas TPU kernels (flash attention, windowed attention, int8
  quantization) with XLA fallbacks for CPU testing.
- ``models``: SAM-style promptable mask decoder, CLIP-ViT tower, LLaMA
  decoder with [SEG]-token machinery, and the composite InteractVLM model.
- ``parallel``: device-mesh construction and sharding rules (data/model axes,
  ZeRO-style optimizer-state sharding).
- ``data`` / ``train`` / ``eval`` / ``fit`` / ``demo``: host-side data
  pipeline, training/eval drivers, joint human-object fitting, demo CLI.
"""

__version__ = "0.1.0"
