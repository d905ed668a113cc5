"""Explicit skew handling (north rule): hot-cell detection, salted two-phase
aggregation, and LSH bucket-width guards.

The reference acknowledges the same problem by randomizing its tile worklist
(cmd/tiler/shuffle.go:11-15) — dense urban cells cluster in z-order. In this
engine:

- broadcast spatial joins are skew-immune (no shuffle on the big side);
- AQE skew-join splitting covers shuffle joins;
- groupBy aggregations get map-side partial aggregation from Spark, and for
  pathological key distributions ``salted_agg`` makes the two-phase split
  explicit (salt → partial → merge) — valid for any commutative monoid;
- tile-encode groups cannot be split (MVT dictionaries are order-sensitive,
  SURVEY.md §7) — ``hot_keys`` surfaces them so the pipeline can cap or
  reroute upstream;
- LSH self-joins get ``cap_buckets``: a bucket shared by too many documents
  (boilerplate shingles) would create a quadratic pair blowup; dropping
  over-wide buckets is the standard guard (it only loses candidates that
  band-agree with thousands of others — near-certain true duplicates that
  exact-dedup already catches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _contains_map(dt: T.DataType) -> bool:
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _row_salt(df: DataFrame, keys: list[str], n_salt: int):
    """Deterministic per-row salt in [0, n_salt).

    Derived from a hash of the row's (hashable) columns, NEVER from
    monotonically_increasing_id or rand: a nondeterministic expression
    feeding shuffle partitioning duplicates or loses rows when a map task
    is recomputed after a fetch failure (the SPARK-23207 class of bugs).
    Identical rows share a salt — acceptable: they carry the same join
    result, and a hot key made of literal duplicate rows is the exact-dedup
    pipeline's problem, not the join's."""
    hashable = [
        f.name for f in df.schema.fields if not _contains_map(f.dataType)
    ] or keys
    return F.pmod(F.xxhash64(*[F.col(c) for c in hashable]), F.lit(n_salt))


def hot_keys(df: DataFrame, keys: list[str], threshold: int) -> DataFrame:
    """Keys whose row count exceeds ``threshold`` (the skew pre-pass)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > threshold)
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    n_salt: int = 16,
) -> DataFrame:
    """Explicit two-phase aggregation with a salt column.

    ``aggs``: {out_name: (partial_fn, merge_fn, col)} where partial runs per
    (keys, salt) and merge re-aggregates per keys — e.g.
    ``{"n": (F.count, F.sum, F.lit(1)), "mx": (F.max, F.max, F.col("v"))}``.
    Output equals the unsalted aggregation for any commutative monoid.
    """
    salted = df.withColumn("_salt", _row_salt(df, keys, n_salt))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[pfn(c).alias(f"_p_{name}") for name, (pfn, _, c) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[mfn(F.col(f"_p_{name}")).alias(name) for name, (_, mfn, c) in aggs.items()]
    )


def cap_buckets(buckets: DataFrame, bucket_col: str, max_width: int) -> DataFrame:
    """Drop buckets wider than ``max_width`` rows before a self-join —
    bounds the join to O(buckets · max_width²).

    Broadcast the OVER-wide set and anti-join: the hot set is small by
    construction (each member exceeds max_width rows, so there are at most
    |rows|/max_width of them), whereas the keep set is nearly every bucket
    and would OOM the driver at corpus scale."""
    hot = (
        buckets.groupBy(bucket_col)
        .agg(F.count(F.lit(1)).alias("_w"))
        .filter(F.col("_w") > max_width)
        .select(bucket_col)
    )
    return buckets.join(F.broadcast(hot), bucket_col, "left_anti")


def salted_cell_join(
    big: DataFrame,
    dim: DataFrame,
    keys: list[str],
    threshold: int = 1_000_000,
    n_salt: int = 16,
) -> DataFrame:
    """Shuffle equi-join with explicit hot-key salting (north rule).

    For keys whose row count on the ``big`` side exceeds ``threshold``
    (dense urban cells / popular-domain clusters), big-side rows get a
    random salt in [0, n_salt) and the ``dim`` side is replicated across
    all salts for those keys; cold keys join with salt 0 — so one hot cell
    spreads over ``n_salt`` reducers instead of one straggler. Join output
    equals the unsalted join exactly (dim replication × salt partition of
    the big side is a partition of the original pairs).

    Complements AQE's skew-join splitting: AQE only splits when a sort-
    merge join's partition exceeds its size threshold at runtime; explicit
    salting also covers hash joins and keeps the plan deterministic.
    """
    hot = (
        hot_keys(big, keys, threshold)
        .select(*keys)
        .withColumn("_hot", F.lit(True))
    )
    p = big.join(F.broadcast(hot), keys, "left").withColumn(
        "_salt",
        F.when(
            F.col("_hot").isNotNull(), _row_salt(big, keys, n_salt)
        ).otherwise(F.lit(0)),
    ).drop("_hot")
    d = dim.join(F.broadcast(hot), keys, "left").withColumn(
        "_salt",
        F.explode(
            F.when(
                F.col("_hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(n_salt - 1)),
            ).otherwise(F.array(F.lit(0)))
        ),
    ).drop("_hot")
    return p.join(d, keys + ["_salt"]).drop("_salt")
