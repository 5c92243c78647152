"""Training loops: contrastive descriptor training, video-score, matching.

Parity targets (reference, for cross-checking — original implementations):
  - descriptor training:  D1/train/train_v106/descriptor_train.py (the most
    feature-complete variant: EMA, FGM, product loss, seeding)
  - video-score training: D1/train/train_vid_score/video_score_train.py
  - matching training:    M1/train/train_matching.py
"""

from vsc22_tpu.train.contrastive import (  # noqa: F401
    ContrastiveConfig,
    TrainState,
    contrastive_loss,
    create_train_state,
    entropy_loss,
    make_train_step,
)
