"""Device-side numerical ops: PCA, similarity maps, alignment kernels.

These replace the reference's external native libraries (sklearn PCA, numba
DP kernel, tslearn DTW, OpenCV image ops) with JAX/XLA implementations; see
SURVEY.md §2.10 for the full mapping.
"""
