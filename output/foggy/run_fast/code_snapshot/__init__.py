"""coin_tpu — a TPU-native framework for Cloud Object Detector Adaptation (CODA).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
COIN framework (detectron2/PyTorch; see /root/reference). Everything that the
reference expresses as per-image Python objects and CUDA kernels is expressed
here as fixed-shape padded tensors, pure-functional train state, and
jit-compiled train steps sharded over a `jax.sharding.Mesh`.

Sub-packages
------------
ops         box algebra, masked NMS + probabilistic-fusion NMS, matching,
            RoIAlign, losses — the "core tensor substrate".
structures  padded Detections pytree (replaces detectron2 Instances).
models      CLIP-ResNet backbone, text towers, RPN, ROI heads, CKG merge net,
            the OpenVocabularyRCNN meta-architectures.
data        VOC-format dataset indexing and device-friendly batching.
solver      optax-based SGD with per-module LR multipliers + two-stage LR.
engine      trainers (pretrain / final adaptation / oracle / eval).
evaluation  Pascal-VOC mAP evaluator.
parallel    mesh construction and sharding helpers.
"""

__version__ = "0.1.0"
