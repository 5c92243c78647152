"""End-to-end pipelines mirroring the reference's shell entry points.

- `descriptor_eval`: search + localize + metrics (reference:
  `python -m vsc.baseline.sscd_baseline`, driven by D1/eval.sh)
- `ensemble`: per-model L2-norm -> concat -> PCA(512) -> score-norm fusion
  (reference: D1/infer/concat_pca_sn.py)
- `extract`: frame -> descriptor feature extraction (reference:
  D1/infer/extract_{ref,query}_feats.py)
"""
