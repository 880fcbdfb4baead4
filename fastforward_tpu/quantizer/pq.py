"""Product quantization (PQ / OPQ) with an own, JAX-accelerated trainer.

Capability-equivalent to the reference's ``NanoPQ``/``NanoOPQ`` wrappers
around the nanopq library (reference: ``quantizer/nanopq.py:9-149``), but
self-contained: codebooks are trained with a vmapped Lloyd's k-means that runs
as a single jitted program (one k-means per subspace, all subspaces in
parallel on device), and scoring decodes *in kernel* via ADC lookup tables
(see ``fastforward_tpu.ops.adc``) instead of materializing fp32 vectors.

Serialized state uses the same attribute/data keys as the reference
(``M``, ``Ks``, ``Ds``, ``metric``, ``verbose``; ``codewords`` and — for OPQ —
the rotation ``R``), so index files are interchangeable.
"""

import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu.quantizer.base import (
    Quantizer,
    QuantizerAttributes,
    QuantizerData,
)

LOGGER = logging.getLogger(__name__)


def _kmeans_one_subspace(
    vecs: jnp.ndarray, centers: jnp.ndarray, iters: int
) -> jnp.ndarray:
    """Lloyd's k-means for one subspace.

    :param vecs: Training vectors, shape ``(n, Ds)``.
    :param centers: Initial centroids, shape ``(Ks, Ds)``.
    :param iters: Number of Lloyd iterations.
    :return: Final centroids, shape ``(Ks, Ds)``.
    """
    ks = centers.shape[0]

    def step(_, centers):
        assign = _nearest_center(vecs, centers)
        sums = jax.ops.segment_sum(vecs, assign, num_segments=ks)
        counts = jax.ops.segment_sum(
            jnp.ones((vecs.shape[0],), vecs.dtype), assign, num_segments=ks
        )
        # empty clusters keep their previous centroid
        safe = jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, sums / safe, centers)

    return jax.lax.fori_loop(0, iters, step, centers)


def _nearest_center(vecs: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """Index of the L2-nearest centroid for each vector."""
    # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 is constant in argmin
    dots = jnp.dot(vecs, centers.T, preferred_element_type=jnp.float32)
    c_sq = jnp.sum(centers * centers, axis=-1)
    return jnp.argmin(c_sq[None, :] - 2.0 * dots, axis=-1).astype(jnp.int32)


@jax.jit
def _train_codebooks(subvecs: jnp.ndarray, init: jnp.ndarray) -> jnp.ndarray:
    """Train all M subspace codebooks in parallel.

    :param subvecs: Training data split by subspace, shape ``(M, n, Ds)``.
    :param init: Initial centroids, shape ``(M, Ks, Ds)``.
    :return: Trained codebooks, shape ``(M, Ks, Ds)``.
    """
    return jax.vmap(lambda v, c: _kmeans_one_subspace(v, c, 20))(subvecs, init)


@jax.jit
def _assign_codes(subvecs: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    """Quantize: nearest codeword per subspace, shape ``(n, M)``."""
    return jax.vmap(_nearest_center)(subvecs, codebooks).T


def _split(vectors: np.ndarray, m: int) -> jnp.ndarray:
    """Reshape ``(n, D)`` into per-subspace ``(M, n, Ds)``."""
    n, d = vectors.shape
    return jnp.asarray(
        np.ascontiguousarray(
            vectors.reshape(n, m, d // m).transpose(1, 0, 2), dtype=np.float32
        )
    )


class PQ(Quantizer):
    """Product quantizer: M subspaces x Ks codewords, trained on device."""

    # serialized state matches the reference's nanopq schema exactly, so
    # emit its class names — files written here load in the reference too
    _compat_name = ("fast_forward.quantizer.nanopq", "NanoPQ")

    def __init__(
        self,
        M: int,
        Ks: int,
        metric: str = "dot",
        verbose: bool = False,
        seed: int = 42,
    ) -> None:
        """Create a product quantizer.

        :param M: Number of subspaces.
        :param Ks: Number of codewords per subspace (<= 2^32).
        :param metric: Kept for reference-format compatibility (unused in
            training; scoring is always inner-product/ADC).
        :param verbose: Enable verbose logging.
        :param seed: PRNG seed for centroid initialization.
        """
        assert 0 < Ks <= 2**32
        self.M = M
        self.Ks = Ks
        self.Ds: int | None = None
        self.metric = metric
        self.verbose = verbose
        self._seed = seed
        self.codewords: np.ndarray | None = None  # (M, Ks, Ds) float32

    def _code_dtype(self) -> np.dtype:
        if self.Ks <= 2**8:
            return np.dtype(np.uint8)
        if self.Ks <= 2**16:
            return np.dtype(np.uint16)
        return np.dtype(np.uint32)

    def _init_centers(self, subvecs: jnp.ndarray) -> jnp.ndarray:
        """Random-point initialization (deterministic via seed)."""
        m, n, _ = subvecs.shape
        rng = np.random.default_rng(self._seed)
        # a distinct random sample of rows per subspace
        idx = np.stack(
            [rng.choice(n, size=self.Ks, replace=self.Ks > n) for _ in range(m)]
        )
        return jnp.take_along_axis(subvecs, jnp.asarray(idx)[:, :, None], axis=1)

    def _fit(self, vectors: np.ndarray, **kwargs: Any) -> None:
        n, d = vectors.shape
        if d % self.M != 0:
            raise ValueError(
                f"Vector dimension ({d}) must be divisible by M ({self.M})."
            )
        if self.Ks > n:
            raise ValueError(f"Need at least Ks ({self.Ks}) training vectors, got {n}.")
        self.Ds = d // self.M
        subvecs = _split(vectors, self.M)
        codebooks = _train_codebooks(subvecs, self._init_centers(subvecs))
        self.codewords = np.asarray(codebooks)
        if self.verbose:
            LOGGER.info("trained PQ: M=%s Ks=%s Ds=%s", self.M, self.Ks, self.Ds)

    def _get_dtype(self) -> np.dtype:
        return self._code_dtype()

    def _get_dims(self) -> tuple[int | None, int | None]:
        if self.Ds is None:
            return None, self.M
        return self.Ds * self.M, self.M

    #: rows per device batch when encoding (bounds the (M, n, Ks) distance
    #: tensor to a few hundred MB)
    _ENCODE_BATCH = 2**15

    def _encode(self, vectors: np.ndarray) -> np.ndarray:
        assert self.codewords is not None
        codebooks = jnp.asarray(self.codewords)
        parts = []
        for i in range(0, vectors.shape[0], self._ENCODE_BATCH):
            batch = vectors[i : i + self._ENCODE_BATCH]
            parts.append(
                np.asarray(_assign_codes(_split(batch, self.M), codebooks))
            )
        return np.concatenate(parts).astype(self._code_dtype())

    def _decode(self, codes: np.ndarray) -> np.ndarray:
        assert self.codewords is not None
        n = codes.shape[0]
        # (n, M, Ds): codeword lookup per subspace, then flatten
        out = self.codewords[np.arange(self.M)[None, :], codes.astype(np.int64)]
        return out.reshape(n, -1)

    def _get_state(self) -> tuple[QuantizerAttributes, QuantizerData]:
        attributes = {
            "M": self.M,
            "Ks": self.Ks,
            "Ds": self.Ds,
            "metric": self.metric,
            "verbose": self.verbose,
        }
        data = {}
        if self.codewords is not None:
            data["codewords"] = self.codewords
        return attributes, data

    @classmethod
    def _from_state(
        cls, attributes: QuantizerAttributes, data: QuantizerData
    ) -> "PQ":
        quantizer = cls(
            M=int(attributes["M"]),
            Ks=int(attributes["Ks"]),
            metric=str(attributes["metric"]),
            verbose=bool(attributes["verbose"]),
        )
        if attributes.get("Ds") is not None:
            quantizer.Ds = int(attributes["Ds"])
        if "codewords" in data:
            quantizer.codewords = np.asarray(data["codewords"])
        return quantizer


class OPQ(PQ):
    """Optimized product quantizer: PQ after a learned rotation.

    The rotation is trained by alternating minimization (project, quantize,
    orthogonal Procrustes update).  At query time the rotation is applied to
    the *query* vectors, so stored codes and the ADC scoring path are
    identical to plain PQ: ``q . (dec @ R^T) == (q @ R) . dec``.
    """

    _compat_name = ("fast_forward.quantizer.nanopq", "NanoOPQ")

    def __init__(
        self,
        M: int,
        Ks: int,
        metric: str = "dot",
        verbose: bool = False,
        seed: int = 42,
        opq_iters: int = 10,
    ) -> None:
        """Create an optimized product quantizer.

        :param M: Number of subspaces.
        :param Ks: Number of codewords per subspace.
        :param metric: Kept for reference-format compatibility.
        :param verbose: Enable verbose logging.
        :param seed: PRNG seed for centroid initialization.
        :param opq_iters: Alternating-minimization iterations for R.
        """
        super().__init__(M, Ks, metric=metric, verbose=verbose, seed=seed)
        self._opq_iters = opq_iters
        self.R: np.ndarray | None = None  # (D, D) float32

    def _fit(self, vectors: np.ndarray, **kwargs: Any) -> None:
        x = np.asarray(vectors, dtype=np.float32)
        _, d = x.shape
        r = np.eye(d, dtype=np.float32)
        for i in range(self._opq_iters):
            super()._fit(x @ r)
            reconstructed = super()._decode(super()._encode(x @ r))
            u, _, vt = np.linalg.svd(x.T @ reconstructed)
            r = (u @ vt).astype(np.float32)
            if self.verbose:
                LOGGER.info("OPQ iteration %s/%s", i + 1, self._opq_iters)
        self.R = r
        super()._fit(x @ r)

    def rotate(self, vectors: np.ndarray) -> np.ndarray:
        """Apply the learned rotation (for queries at scoring time)."""
        assert self.R is not None
        return np.asarray(vectors, dtype=np.float32) @ self.R

    def _encode(self, vectors: np.ndarray) -> np.ndarray:
        return super()._encode(self.rotate(vectors))

    def _decode(self, codes: np.ndarray) -> np.ndarray:
        assert self.R is not None
        return super()._decode(codes) @ self.R.T

    def _get_state(self) -> tuple[QuantizerAttributes, QuantizerData]:
        attributes, data = super()._get_state()
        if self.R is not None:
            data = dict(data)
            data["R"] = self.R
        return attributes, data

    @classmethod
    def _from_state(
        cls, attributes: QuantizerAttributes, data: QuantizerData
    ) -> "OPQ":
        quantizer = cls(
            M=int(attributes["M"]),
            Ks=int(attributes["Ks"]),
            metric=str(attributes["metric"]),
            verbose=bool(attributes["verbose"]),
        )
        if attributes.get("Ds") is not None:
            quantizer.Ds = int(attributes["Ds"])
        if "codewords" in data:
            quantizer.codewords = np.asarray(data["codewords"])
        if "R" in data:
            quantizer.R = np.asarray(data["R"])
        return quantizer


# drop-in aliases matching the reference class names
NanoPQ = PQ
NanoOPQ = OPQ
