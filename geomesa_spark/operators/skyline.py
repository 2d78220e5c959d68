"""Skyline (Pareto front) query: the non-dominated rows under a set of
minimize/maximize criteria — "close to hub A AND close to hub B AND
cheap", the classic multi-criteria location query (Börzsönyi et al.
2001). The reference engine answers single-criterion proximity (kNN,
dwithin); the skyline is its multi-criteria generalization.

Distributed shape (the standard two-phase skyline):

1. LOCAL phase: every partition computes its own skyline with a
   sort-then-scan (no point eliminated here can be in the global
   answer, because domination is transitive and partition-local
   dominators survive or are themselves dominated by survivors).
   Runs as mapInPandas — numpy sort + vectorized domination scan.
2. MERGE phase: the surviving candidates (typically orders of
   magnitude smaller than the input — skyline size grows
   polylogarithmically for independent dims) coalesce to one
   partition and the same scan runs once more.

No shuffle of the raw data: phase 1 is map-only; only candidates move.
A pathological correlated dataset can have a large skyline — the merge
then degrades to a single-task scan over exactly the answer set, which
any exact skyline must materialize anyway.

Domination is the strict-somewhere/no-worse-everywhere rule: p
dominates q iff p <= q on every criterion and p < q on at least one
(after negating maximized columns). Duplicated criterion vectors do
not dominate each other — all copies are returned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["skyline"]


def _local_skyline(mat: np.ndarray) -> np.ndarray:
    """Indexes of non-dominated rows of ``mat`` (all-minimize).

    Lexicographic sort, then each row is checked against the kept set
    (vectorized): a row survives iff no kept row is <= it everywhere
    and < somewhere. Sorting guarantees a dominator always precedes
    its victims, so one forward pass suffices.
    """
    n = len(mat)
    order = np.lexsort(mat.T[::-1])   # by col0, then col1, ...
    kept: list[int] = []
    # preallocated kept-matrix (vstack-per-append would copy the whole
    # set each time — O(k^2) copies on large fronts)
    kmat = np.empty((n, mat.shape[1]))
    k = 0
    for i in order:
        row = mat[i]
        if k:
            le = (kmat[:k] <= row).all(axis=1)
            lt = (kmat[:k] < row).any(axis=1)
            if (le & lt).any():
                continue
        kept.append(i)
        kmat[k] = row
        k += 1
    out = np.zeros(n, dtype=bool)
    out[kept] = True
    return out


def skyline(df: DataFrame, criteria: list, minimize: list | None = None) -> DataFrame:
    """Rows of ``df`` not dominated on the ``criteria`` columns
    (numeric). ``minimize[i]=False`` maximizes that criterion. All
    original columns pass through.
    """
    if not criteria:
        raise ValueError("skyline needs at least one criterion column")
    if minimize is None:
        minimize = [True] * len(criteria)
    if len(minimize) != len(criteria):
        raise ValueError("minimize must match criteria length")
    # NULL/NaN criteria are dropped up front: numpy comparisons treat NaN
    # as incomparable (a NaN row would always survive and never dominate),
    # while a SQL total order sorts NaN above everything — dropping them
    # here keeps the distributed result and any SQL oracle from silently
    # diverging. Callers wanting such rows must impute first.
    from pyspark.sql import functions as F
    for c in criteria:
        df = df.filter(F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double")))
    signs = np.array([1.0 if m else -1.0 for m in minimize])
    schema = df.schema

    def scan(iterator):
        # per-batch is SAFE here: over-retention only (a batch-local
        # survivor may still die in the merge)
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            mat = pdf[criteria].to_numpy(dtype=np.float64) * signs
            yield pdf[_local_skyline(mat)]

    def merge(iterator):
        # the merge MUST see every candidate together: Arrow feeds the
        # single partition as multiple batches, and a per-batch scan
        # would never compare batch 1's survivors against batch 2's
        parts = [pdf for pdf in iterator if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        mat = pdf[criteria].to_numpy(dtype=np.float64) * signs
        yield pdf[_local_skyline(mat)]

    local = df.mapInPandas(scan, schema=schema)
    # merge: candidates only. repartition (a shuffle), NOT coalesce —
    # coalesce(1) is a narrow dependency that would pull the whole
    # phase-1 scan into the single merge task, serializing it
    return local.repartition(1).mapInPandas(merge, schema=schema)
