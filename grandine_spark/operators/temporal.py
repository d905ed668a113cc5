"""As-of (temporal) join — match each left row to the most recent right row.

The web-corpus shape: events (or page fetches) carry timestamps, and a
query wants "the latest page version / profile state / preceding view as
of this event's time" — a join SQL can only express with correlated
subqueries. DuckDB spells it ``ASOF JOIN`` (the oracle uses exactly that);
Spark has no built-in, so this implements the canonical scalable plan:

  union both sides tagged → ONE shuffle on the key → ONE in-partition sort
  by (ts, side, seq) → ``last(right_payload, ignorenulls=True)`` running
  window → keep left rows.

That is strictly better at scale than the per-key ``joinWith`` / range-join
alternatives: no range explosion, no per-key driver loop, no broadcast of
either side, and the state per window frame is a single struct (the frame
is unbounded-preceding→current, which Spark evaluates as a running
accumulator, not a buffered frame). Skewed keys cost what any windowed
aggregation costs; a 100 TB run sizes ``spark.sql.shuffle.partitions`` for
the union of both inputs.

Determinism when the right side has equal timestamps on a key is defined
as "greatest ``right_seq`` wins" (ties ordered by the seq column inside
the sort), matching the deduped-right ASOF oracle.

No reference parity: thomersch/grandine is batch-geo only; this is a
BASELINE.md training-data-pipeline extension (axes: pyspark x webtext).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_seq: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: each left row gains ``right_cols`` from the
    right row with the greatest ``right_ts`` <= ``left_ts`` (strictly <
    when ``strict``) on the same ``on`` key, or NULLs if none precedes it.

    ``right_seq`` breaks equal-timestamp ties (greatest wins); required for
    a deterministic result if (on, right_ts) is not unique in ``right``.

    ``right_cols`` may not collide with a left column name: the output
    would carry two columns of that name and every downstream by-name
    reference would hit AMBIGUOUS_REFERENCE — rename on the way in.
    """
    clash = sorted(set(right_cols) & set(left.columns))
    if clash:
        raise ValueError(
            f"right_cols {clash} collide with left columns; alias them on "
            "the right DataFrame before the asof_join"
        )
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_asof")
    seq = F.col(right_seq).cast("long") if right_seq else F.lit(0).cast("long")
    # right rows sort before left at equal ts for inclusive (<=) semantics,
    # after left for strict (<)
    right_side = 0 if not strict else 2
    # SQL join semantics: NULL keys never compare equal (DuckDB's ASOF JOIN
    # leaves NULL-key left rows unmatched), and a NULL right_ts precedes
    # nothing — drop both here; otherwise partitionBy would co-group the
    # NULLs and NULL _ts would sort before (hence "precede") every left row.
    r = right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull()).select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(right_side).alias("_side"),
        seq.alias("_seq"),
        payload,
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_seq"),
        F.lit(None).cast(r.schema["_asof"].dataType).alias("_asof"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
    )
    r = r.withColumn("_left", F.lit(None).cast(l.schema["_left"].dataType))
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_m", F.last("_asof", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_left.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_m.{c}").alias(c) for c in right_cols]
    return matched.select(*out_cols)
