"""Flax model zoo: descriptor backbones and matching-track models.

Parity targets (reference, for cross-checking — original Flax implementations):
  - SSCD ViT+GeM descriptor:  D1/train/train_v68/vsc/baseline/model_factory/backbones/sscd.py:11-152
  - SwinV2+GeM descriptor:    D1/train/train_v106/vsc/baseline/model_factory/backbones/swinv2.py:509-678
  - video-score model (VED):  D1/train/train_vid_score/video/model.py:63-103
  - matching classify/SAM:    M1/train/models.py:6-48

All models are pure Flax modules; compute dtype is bf16 by default on TPU
(params stay f32), batches are static-shape, and the hot ops (patch embed,
attention, GeM) map onto the MXU.
"""

from vsc22_tpu.models.registry import BACKBONES, build_backbone  # noqa: F401
from vsc22_tpu.models.vit import VisionTransformer, VitDescriptor  # noqa: F401
