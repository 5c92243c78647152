"""Host data runtime: decode, frame stores, preprocessing, augmentation.

This layer replaces the reference's L0-L2 host stack (ffmpeg subprocess
decode, LMDB frame store, OpenCV preprocessing, AugLy/albumentations
augmentation — SURVEY.md §2.1/§2.2) with:

- `frames`: pluggable video decode (ffmpeg subprocess / OpenCV backends);
- `store`: a zip/record frame store with a C++ mmap fast path;
- `fsd`: Frame Scenes Detection — letterbox removal + stacked-frame
  splitting, with device (XLA) variance/edge maps and host cut decisions;
- `transforms`: per-backbone resize/normalize presets as device ops;
- `augment`: the training augmentation suite.
"""
