"""PCA on device (the ensemble-fusion dimensionality reduction).

Parity target (reference, for cross-checking — original implementation):
  D1/infer/concat_pca_sn.py:41-64 — sklearn PCA(512, random_state=2023) fit
  on the train reference descriptors (4x512 L2-normalized concat -> 2048),
  then applied to all sets.

Implementation: exact PCA via eigendecomposition of the D x D covariance
(D = 2048, so eigh is trivially cheap compared to the N x D Gram work, and
the N x D data never needs more than one pass for mean/covariance — both are
MXU GEMMs). Component signs follow sklearn's `svd_flip` convention (largest
absolute loading per component made positive) so transforms are comparable
across implementations up to the usual randomized-vs-exact solver noise.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PCAModel:
    mean: np.ndarray  # [D]
    components: np.ndarray  # [k, D] rows = principal axes
    explained_variance: np.ndarray  # [k]

    def transform(self, x: np.ndarray) -> np.ndarray:
        # Host numpy: per-video inputs have varying row counts and jit would
        # recompile per shape; this is a tiny [N, D] x [D, k] product.
        return (np.asarray(x, np.float32) - self.mean) @ self.components.T

    def save(self, path: str) -> None:
        np.savez(
            path,
            mean=self.mean,
            components=self.components,
            explained_variance=self.explained_variance,
        )

    @classmethod
    def load(cls, path: str) -> "PCAModel":
        data = np.load(path)
        return cls(
            mean=data["mean"],
            components=data["components"],
            explained_variance=data["explained_variance"],
        )


def _cov_and_mean(x: jnp.ndarray):
    n = x.shape[0]
    mean = jnp.mean(x, axis=0)
    xc = x - mean[None, :]
    cov = jnp.dot(xc.T, xc, preferred_element_type=jnp.float32) / (n - 1)
    return cov, mean


@jax.jit
def _fit_kernel(x):
    cov, mean = _cov_and_mean(x)
    eigvals, eigvecs = jnp.linalg.eigh(cov)  # ascending
    eigvals = eigvals[::-1]
    components = eigvecs[:, ::-1].T  # [D, D] rows = axes, descending variance
    # sklearn svd_flip convention: make the max-|loading| entry positive.
    max_idx = jnp.argmax(jnp.abs(components), axis=1)
    signs = jnp.sign(components[jnp.arange(components.shape[0]), max_idx])
    components = components * signs[:, None]
    return mean, components, eigvals


def pca_fit(x: np.ndarray, n_components: int) -> PCAModel:
    """Fit exact PCA; returns the top `n_components` axes."""
    x = jnp.asarray(np.asarray(x, np.float32))
    mean, components, eigvals = _fit_kernel(x)
    k = n_components
    return PCAModel(
        mean=np.asarray(mean),
        components=np.asarray(components[:k]),
        explained_variance=np.clip(np.asarray(eigvals[:k]), 0.0, None),
    )
