"""OpenPVSG-TPU: a TPU-native framework for Panoptic Video Scene Graph
Generation (PVSG).

Rebuilds the full capability surface of the reference PyTorch/mmdet stack
(LilyDaytoy/OpenPVSG) as an idiomatic JAX/XLA/Pallas framework:

- ``openpvsg_tpu.data``      — pvsg.json schema, palette-mask decoding, RLE
  codec, deterministic on-device frame pipeline, dataset iterators.
- ``openpvsg_tpu.models``    — Mask2Former IPS/VPS segmenters (flax), fusion
  postprocessing, relation heads.
- ``openpvsg_tpu.tracker``   — UniTrack-style mask-tube association (vmapped
  Kalman + device cost kernels + host state machine).
- ``openpvsg_tpu.ops``       — TPU compute primitives (bilinear/point
  sampling, multi-scale deformable attention, Pallas kernels).
- ``openpvsg_tpu.train``     — Hungarian target assignment, point-sampled
  losses, pjit data-parallel train steps, orbax checkpointing.
- ``openpvsg_tpu.eval``      — PQ/VPQ, R@K/mR@K, vIoU, tube matching.
- ``openpvsg_tpu.parallel``  — device mesh / sharding helpers.
- ``openpvsg_tpu.native``    — in-repo C++ host library (RLE codec, LAPJV).
"""

__version__ = "0.1.0"

# Class/relation cardinalities of the PVSG task (reference:
# datasets/datasets/pvsg_image.py:33-39, tools/rel_train.py:58).
NUM_THING_CLASSES = 115
NUM_STUFF_CLASSES = 11
NUM_CLASSES = NUM_THING_CLASSES + NUM_STUFF_CLASSES  # 126
NUM_RELATIONS = 57

# Panoptic id conventions. The mmdet-internal format uses
# segment = label + inst * INSTANCE_OFFSET; the evaluation ("hb") format uses
# segment = label * EVAL_DIVISOR + inst (reference: datasets/datasets/
# utils.py:107-119 pan_mm2hb, mmdet.core INSTANCE_OFFSET).
INSTANCE_OFFSET = 1000
EVAL_DIVISOR = 10000
