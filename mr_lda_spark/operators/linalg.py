"""Distributed dense linear-algebra sufficient statistics over an
embedding column — the one-pass Gram / covariance primitive every
representation-learning pipeline needs (whitening, PCA, linear-probe
fits, feature-correlation audits) and the classic "X^T X in one
map-side pass" pattern (no counterpart in the reference, which has no
vector surface; the in-mapper-combining idea is the same one its
DocumentMapper uses for φ sufficient statistics).

INTEGER-EXACT by quantization: components are mapped to
``floor(x·scale + 0.5)`` int64 micro-units first, so every partial
Gram block is exact integer arithmetic, partials can be summed in ANY
order, and a DuckDB SQL oracle matches bit-for-bit — the same
trick as the integer-exact pagerank / kmeans / lift oracles (floats
summed in nondeterministic partition order could never hash-match).

Scale shape (100 TB): each Arrow batch contributes one d×d int64
block computed JVM-adjacent in numpy (``Q.T @ Q`` — BLAS-free integer
matmul, d² output per batch regardless of batch rows), the shuffle
carries only d(d+1)/2 + d + 1 rows per partition (for d=64: 2 145),
and the final agg is a map-side-combined DECIMAL(38,0) sum.  Nothing
driver-sized anywhere; overflow headroom is explicit — |q| ≤ scale,
so a batch of B rows bounds each cell by B·scale², 4·10^16 for
B=10^4 at scale=10^6, inside int64; the cross-batch sum is decimal."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["gram_moments"]

_GRAM_SCHEMA = "i int, j int, s long"


def gram_moments(
    vecs: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1_000_000,
) -> DataFrame:
    """One-pass exact second-moment statistics of an embedding column
    → (i, j, s DECIMAL(38,0)) with 1-based component indices:

    - ``(i, j)`` with ``1 ≤ i ≤ j ≤ dim``: the Gram entry
      Σ_rows q_i·q_j over quantized components (upper triangle —
      the matrix is symmetric),
    - ``(i, 0)``: the first moment Σ_rows q_i,
    - ``(0, 0)``: the row count.

    One relation therefore carries everything needed to finish mean,
    covariance, or correlation DRIVER-SIDE on d² numbers: for
    example cov_ij = (s_ij − s_i·s_j/n) / (n·scale²).  Rows with a
    NULL or wrong-length vector are counted out (dropped) rather than
    silently zero-padded."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        iu, ju = np.triu_indices(dim)
        for pdf in batches:
            vs = [
                v
                for v in pdf[vec_col]
                if v is not None and len(v) == dim
            ]
            if not vs:
                continue
            x = np.asarray(vs, dtype=np.float64)
            q = np.floor(x * float(scale) + 0.5).astype(np.int64)
            g = q.T @ q
            out = pd.DataFrame(
                {
                    "i": np.concatenate(
                        [iu + 1, np.arange(1, dim + 1), [0]]
                    ).astype(np.int32),
                    "j": np.concatenate(
                        [ju + 1, np.zeros(dim, np.int64), [0]]
                    ).astype(np.int32),
                    "s": np.concatenate(
                        [g[iu, ju], q.sum(axis=0), [len(vs)]]
                    ).astype(np.int64),
                }
            )
            yield out

    partials = vecs.select(vec_col).mapInPandas(kernel, schema=_GRAM_SCHEMA)
    return partials.groupBy("i", "j").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("s")
    )
