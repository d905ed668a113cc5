"""Deterministic corpus sampling (training-data pipeline ops).

Training mixes are specified as quotas ("200k docs per language", "cap any
single domain at 1%") and must be *reproducible* — re-running the pipeline
on the same corpus must pick the same documents, with no RNG state and no
dependence on partitioning or row order. Both operators therefore derive
their randomness from md5 of the stable document id, which also makes them
exactly expressible in ANSI SQL for the oracle.

Scale notes (100 TB): ``hash_sample`` is a pure map-side filter — it
pushes down to the scan, shuffles nothing, and its selectivity is exact in
expectation with no coordination. ``quota_sample`` is one shuffle on the
stratum key + a running rank; the per-stratum state is a single counter.
A stratum far larger than its quota still sorts only within its
partition — for pathological skew (one stratum = half the corpus) a
pre-filter with ``hash_sample`` at a rate slightly above quota/|stratum|
bounds the sorted volume; that composition is the documented pattern, not
an automatism.

No reference parity (grandine has no sampler): BASELINE.md
training-data-pipeline extension (axes: pyspark x webtext).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_u01(id_col: str):
    """Deterministic uniform-ish [0,1) from the first 15 hex digits of
    md5(id) — 60 bits, exactly reproducible in SQL as
    ('0x' || substr(md5(id), 1, 15))::BIGINT / 2^60."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("long")
    return h / F.lit(float(1 << 60))


def hash_sample(df: DataFrame, rate: float, id_col: str = "doc_id") -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on md5(id): a row is kept
    iff hash_u01(id) < rate. Partitioning-independent, join-stable (the
    same id always makes the same decision, so sampled tables still join).

    Samples on the same id NEST, they don't multiply: hash_sample(p2) of a
    hash_sample(p1) output keeps md5 < min(p1, p2) — the smaller sample is
    always a subset of the larger (the property that makes progressive
    sampling reproducible). For an independent sub-sample, sample on a
    salted key instead.
    """
    return df.filter(_hash_u01(id_col) < F.lit(float(rate)))


def quota_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """At most ``quota`` rows per stratum, chosen by md5(id) order (a
    deterministic uniform draw), ties broken by id. Returns the input
    columns plus ``sample_rank`` (1-based within the stratum)."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= quota)
    )


def weighted_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli rates (the training-mix table: {'en': 0.5,
    'de': 0.1, ...}) with the same md5-keyed determinism as
    ``hash_sample``. Still a pure map-side filter — the rate table compiles
    to a CASE expression, so the mix needs no join, no shuffle, and no
    broadcast; unknown strata fall to ``default_rate``."""
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == F.lit(k), F.lit(float(v))).otherwise(rate)
    return df.filter(_hash_u01(id_col) < rate)
