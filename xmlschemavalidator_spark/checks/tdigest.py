"""Per-partition mergeable quantile sketches (t-digest-style) for
distribution-drift checks at 100 TB.

The exact histogram-CDF path (drift.py) needs a bounded value domain; this
sketch handles unbounded/continuous columns: each partition compresses its
values into at most ``delta`` weighted centroids (one mapInPandas pass,
numpy-vectorized), the tiny centroid sets are merged on the driver (≤
delta × #partitions rows — kilobytes), and quantiles interpolate over the
merged centroid CDF. Mergeability is what makes it a treeAggregate-shaped
computation: partial sketches combine associatively, so the same code
serves incremental/streaming baselines.

This is the centroid-compression core of the t-digest family (Dunning's
t-digest adds non-uniform centroid sizing near the tails; we use uniform
sizing — simpler, deterministic, and adequate for KS-style max-gap drift
which probes mid-distribution quantiles).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


@dataclass
class Digest:
    """Weighted centroids, sorted by mean."""

    means: np.ndarray  # float64
    weights: np.ndarray  # int64

    @property
    def total(self) -> int:
        return int(self.weights.sum())

    def quantile(self, q: float) -> float:
        """Interpolated quantile over the centroid CDF."""
        if len(self.means) == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.total
        return float(np.interp(target, cum, self.means))

    def quantiles(self, qs: list[float]) -> list[float]:
        return [self.quantile(q) for q in qs]


def _dedup_means(means: np.ndarray, weights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Collapse centroids with identical means (discrete/low-cardinality
    columns produce many). np.interp over a non-strictly-increasing grid is
    ill-conditioned — duplicate means made an IDENTICAL distribution show
    ~0.1 self-drift before this."""
    if len(means) == 0:
        return means, weights
    um, inv = np.unique(means, return_inverse=True)
    if len(um) == len(means):
        return means, weights
    uw = np.bincount(inv, weights=weights).astype(np.int64)
    return um, uw


def _compress(values: np.ndarray, weights: np.ndarray, delta: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted weighted points into <= delta centroids of ~equal weight."""
    order = np.argsort(values, kind="stable")
    v, w = values[order], weights[order]
    if len(v) <= delta:
        return _dedup_means(v, w)
    cum = np.cumsum(w)
    total = cum[-1]
    bounds = np.searchsorted(cum, np.linspace(total / delta, total, delta), side="left")
    bounds = np.unique(np.concatenate([[0], bounds + 1]))
    means, weights_out = [], []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        ww = w[lo:hi]
        if ww.sum() == 0:
            continue
        means.append(float(np.average(v[lo:hi], weights=ww)))
        weights_out.append(int(ww.sum()))
    return _dedup_means(np.array(means), np.array(weights_out, dtype=np.int64))


def partition_digests(df: DataFrame, column: str, delta: int = 200) -> DataFrame:
    """One sketch per partition: (partition_id, mean, weight) centroid rows.
    A single narrow mapInPandas pass; output size ≤ delta per partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyspark

        vals: list[np.ndarray] = []
        pid = pyspark.TaskContext.get().partitionId()
        for b in batches:
            a = b[column].dropna().to_numpy(dtype=np.float64)
            if len(a):
                vals.append(a)
        if not vals:
            yield pd.DataFrame({"partition_id": [], "mean": [], "weight": []})
            return
        allv = np.concatenate(vals)
        m, w = _compress(allv, np.ones(len(allv), dtype=np.int64), delta)
        yield pd.DataFrame({"partition_id": pid, "mean": m, "weight": w})

    return df.select(column).mapInPandas(
        run, "partition_id int, mean double, weight long"
    )


def partition_digests_multi(
    df: DataFrame, columns: list[str], delta: int = 200
) -> DataFrame:
    """Sketches for N columns in ONE pass over the table:
    ``(column, partition_id, mean, weight)`` rows. The per-column loop the
    earlier API forced (one full scan per column) collapses to a single
    mapInPandas stage; output stays ≤ delta × N per partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyspark

        pid = pyspark.TaskContext.get().partitionId()
        vals: dict[str, list[np.ndarray]] = {c: [] for c in columns}
        for b in batches:
            for c in columns:
                a = b[c].dropna().to_numpy(dtype=np.float64)
                if len(a):
                    vals[c].append(a)
        frames = []
        for c in columns:
            if not vals[c]:
                continue
            allv = np.concatenate(vals[c])
            m, w = _compress(allv, np.ones(len(allv), dtype=np.int64), delta)
            frames.append(
                pd.DataFrame({"column": c, "partition_id": pid, "mean": m, "weight": w})
            )
        if not frames:
            yield pd.DataFrame({"column": [], "partition_id": [], "mean": [], "weight": []})
            return
        yield pd.concat(frames, ignore_index=True)

    return df.select(*columns).mapInPandas(
        run, "column string, partition_id int, mean double, weight long"
    )


def merge_digests(centroids: pd.DataFrame, delta: int = 200) -> Digest:
    """Driver-side merge of per-partition centroid rows (associative)."""
    if len(centroids) == 0:
        return Digest(np.array([]), np.array([], dtype=np.int64))
    m, w = _compress(
        centroids["mean"].to_numpy(np.float64),
        centroids["weight"].to_numpy(np.int64),
        delta,
    )
    return Digest(m, w)


def digest_of(df: DataFrame, column: str, delta: int = 200) -> Digest:
    """End-to-end: per-partition sketch pass → driver merge."""
    return merge_digests(partition_digests(df, column, delta).toPandas(), delta)


def _cdf_sided(d: Digest, xs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Step-CDF over the centroid point masses, BOTH one-sided limits at
    each x: ``(F(x−), F(x+)) = (W(<x), W(<=x)) / total``. The sup of
    |F1 − F2| for step functions must consider both limits at every jump —
    the earlier mid-mass convention (½·w(=x)) halved the gap at shared
    atoms, so two fully disjoint point masses scored 0.5 instead of 1.0
    and discrete-column thresholds under-fired (round-1 advisor finding)."""
    cum = np.cumsum(d.weights)
    left = np.searchsorted(d.means, xs, side="left")
    right = np.searchsorted(d.means, xs, side="right")
    f_minus = np.where(left > 0, cum[np.maximum(left - 1, 0)], 0) / d.total
    f_plus = np.where(right > 0, cum[np.maximum(right - 1, 0)], 0) / d.total
    return f_minus, f_plus


def quantile_gap_drift(
    current: Digest, baseline: Digest, qs: list[float] | None = None
) -> float:
    """Two-sample KS statistic over the sketch CDFs:
    ``sup_x |F_cur(x) - F_base(x)|`` evaluated on the pooled centroid
    support (the sup of a difference of step functions is attained at a
    step — checking BOTH the right-continuous value and the left limit at
    each support point, so disjoint point masses correctly score 1.0 and
    thresholds are comparable to textbook KS critical values). 0 =
    identical — including for constant / low-cardinality columns, where
    the earlier quantile-grid formulation reported up to 0.45 self-drift.
    ``qs`` adds extra probe quantiles of the current digest to the
    evaluation grid (kept for API compat; the pooled support already
    dominates it)."""
    if baseline.total == 0 or current.total == 0:
        return float("nan")
    xs = np.union1d(current.means, baseline.means)
    if qs:
        xs = np.union1d(xs, np.array([current.quantile(q) for q in qs]))
    c_minus, c_plus = _cdf_sided(current, xs)
    b_minus, b_plus = _cdf_sided(baseline, xs)
    return float(
        max(np.max(np.abs(c_plus - b_plus)), np.max(np.abs(c_minus - b_minus)))
    )
