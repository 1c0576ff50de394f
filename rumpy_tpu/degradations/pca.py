"""PCA encoding of blur kernels (and noise patches).

The reference fits a PCA basis over flattened kernels with torch SVD
(srmd_gaussian_blur.py:289-313) or loads a shipped ``.pth`` matrix
(blur/__init__.py:18-36). Here the basis is fit with jnp SVD from kernels
generated on-device, stored as ``.npz``; encoding is a single matmul that
fuses into the degradation step. Loading the reference's torch matrices is
supported for checkpoint-parity experiments (torch-cpu is a host-side
loader only).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def fit_pca(samples: jnp.ndarray, k: int = 10) -> jnp.ndarray:
    """PCA projection matrix (k, D) from (N, D) samples — matches the
    reference's convention of projecting with V^T from the SVD of the
    *uncentered* data (srmd_gaussian_blur.py:289-294)."""
    x = jnp.asarray(samples, jnp.float32)
    _, _, vt = jnp.linalg.svd(x, full_matrices=False)
    return vt[:k]


class PCAEncoder:
    """Project flattened kernels onto a fixed PCA basis."""

    def __init__(self, matrix):
        self.matrix = jnp.asarray(matrix, jnp.float32)  # (k, D)

    @property
    def components(self) -> int:
        return self.matrix.shape[0]

    def __call__(self, flat: jnp.ndarray) -> jnp.ndarray:
        return jnp.matmul(flat, self.matrix.T,
                          precision=jax.lax.Precision.HIGHEST)

    def save(self, path: str) -> None:
        np.savez(path, matrix=np.asarray(self.matrix))

    @staticmethod
    def load(path: str) -> "PCAEncoder":
        if path.endswith(".pth"):
            import torch  # host-side loader for reference-format matrices
            # reference stores (D, k) — e.g. (441, 10) — and encodes with
            # flat @ matrix (srmd_gaussian_blur.py:297-313); our
            # convention is (k, D) with flat @ matrix.T, so transpose.
            mat = torch.load(path, map_location="cpu").float().numpy()
            return PCAEncoder(mat.T)
        data = np.load(path)
        return PCAEncoder(data["matrix"])


#: Packaged projection matrices converted from the reference's shipped
#: ``shared_framework/configuration/*_pca_matrix.pth`` (441 = 21x21
#: flattened blur kernels -> 10 / 100 components).
_PACKAGED = {
    "standard": "standard_blur_10_component_pca_matrix.npz",
    "extended": "extended_blur_100_component_pca_matrix.npz",
}


def read_pca_matrix(name_or_path: str) -> PCAEncoder:
    """Resolve 'standard' / 'extended' to the packaged matrices, else
    treat as a path (reference: blur/__init__.py:18-36)."""
    import os
    if name_or_path in _PACKAGED:
        here = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "config", _PACKAGED[name_or_path])
        return PCAEncoder.load(here)
    return PCAEncoder.load(name_or_path)


def fit_kernel_pca(sample_fn, batch_len: int = 30000, k: int = 10,
                   seed: int = 0, chunk: int = 5000) -> PCAEncoder:
    """Fit PCA from kernels generated on-device in chunks.

    :param sample_fn: key, n -> (n, ks, ks) kernels.
    """
    key = jax.random.PRNGKey(seed)
    chunks = []
    remaining = batch_len
    while remaining > 0:
        key, sub = jax.random.split(key)
        n = min(chunk, remaining)
        kern = sample_fn(sub, n)
        chunks.append(np.asarray(kern.reshape(n, -1)))
        remaining -= n
    return PCAEncoder(fit_pca(jnp.asarray(np.concatenate(chunks)), k=k))
