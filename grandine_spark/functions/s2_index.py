"""S2 cell indexing for DataFrames — vectorized Arrow UDF + SQL twin.

The encode is a 4-state Hilbert machine iterated per level; expressed as
native Catalyst columns the orientation state is referenced ~3× per
level and ProjectCollapse inlines each reference, so the expression tree
grows 3^level — unusable past ~level 8. The north rule prescribes the
right shape anyway ("indexed with H3/S2 cell IDs via vectorized
pandas/Arrow UDFs"): one scalar pandas UDF per side, batch-vectorized in
``kernels/s2.py`` (level-L encode = L numpy passes over the Arrow
batch — the same pattern as similarity.py's hyperplane/IVF kernels).

Everything AFTER the encode is plain bit arithmetic and stays JVM-native:
parent/prefix (``s2_parent``), descendant ranges (``s2_range_cols``),
joins on the packed id.

``s2_sql_parts`` emits a staged DuckDB twin (chained CTEs keep the SQL
text linear in the level count) for the oracle gate: an independent
re-derivation of face/uv/st quantization and the Hilbert tables in pure
SQL, so a table error in either side breaks the hash match.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..kernels.s2 import IJ_TO_POS, POS_TO_ORIENT, cell_ids

# double literal of pi/180, identical in numpy's radians and the SQL twin
_DEG = 0.017453292519943295


def s2_cell(lat: Column, lon: Column, level: int) -> Column:
    """Packed S2 cell id (face << 2·level | hilbert_pos) as a LongType
    Column — one Arrow-batched numpy kernel call per batch."""

    @F.pandas_udf(LongType())
    def enc(la: pd.Series, lo: pd.Series) -> pd.Series:
        return pd.Series(cell_ids(la.to_numpy(), lo.to_numpy(), level))

    return enc(lat, lon)


def s2_parent(cell: Column, delta_levels: int) -> Column:
    """Ancestor ``delta_levels`` up — native shiftright (prefix property)."""
    return F.shiftright(cell, 2 * delta_levels)


def s2_range_cols(cell: Column, delta_levels: int) -> tuple[Column, Column]:
    """[lo, hi) packed-id range of descendants ``delta_levels`` down —
    native; pairs with a range join or BETWEEN prefilter."""
    return (
        F.shiftleft(cell, 2 * delta_levels),
        F.shiftleft(cell + 1, 2 * delta_levels),
    )


def s2_sql_parts(lat: str, lon: str, level: int, keys: str = "doc_id") -> str:
    """DuckDB CTE chain computing the packed S2 cell id for point rows.

    Returns SQL text for CTE bodies ``s2base → s2fuv → s2ij → s2l0 … →
    s2cell``; the caller composes ``WITH pts AS (...), {this} SELECT …
    FROM s2cell`` where ``s2cell`` has columns ``{keys}, s2_cell``.
    ``lat``/``lon`` are expressions over the ``pts`` CTE."""
    n = 1 << level
    ij_to_pos = ",".join(str(v) for row in IJ_TO_POS for v in row)
    pos_to_orient = ",".join(str(v) for v in POS_TO_ORIENT)
    parts = [
        f"""s2base AS (
  SELECT {keys},
         cos(({lat}) * {_DEG}) * cos(({lon}) * {_DEG}) AS px,
         cos(({lat}) * {_DEG}) * sin(({lon}) * {_DEG}) AS py,
         sin(({lat}) * {_DEG}) AS pz
  FROM pts)""",
        f"""s2axis AS (
  SELECT *, CASE WHEN abs(px) > abs(py)
                 THEN (CASE WHEN abs(px) > abs(pz) THEN 0 ELSE 2 END)
                 ELSE (CASE WHEN abs(py) > abs(pz) THEN 1 ELSE 2 END)
            END AS axis
  FROM s2base)""",
        f"""s2face AS (
  SELECT *, CASE WHEN comp >= 0 THEN axis ELSE axis + 3 END AS face
  FROM (SELECT *, CASE axis WHEN 0 THEN px WHEN 1 THEN py ELSE pz END AS comp
        FROM s2axis))""",
        f"""s2fuv AS (
  SELECT {keys}, face,
         (CASE face WHEN 0 THEN py WHEN 1 THEN -px WHEN 2 THEN -px
                    WHEN 3 THEN pz WHEN 4 THEN pz ELSE -py END) / comp AS u,
         (CASE face WHEN 0 THEN pz WHEN 1 THEN pz WHEN 2 THEN -py
                    WHEN 3 THEN py WHEN 4 THEN -px ELSE -px END) / comp AS v
  FROM s2face)""",
        f"""s2ij AS (
  SELECT {keys}, face,
         LEAST(GREATEST(CAST(FLOOR(
           (CASE WHEN u >= 0.0 THEN 0.5*sqrt(1.0 + 3.0*abs(u))
                 ELSE 1.0 - 0.5*sqrt(1.0 + 3.0*abs(u)) END) * {n}.0)
           AS BIGINT), 0), {n - 1}) AS i,
         LEAST(GREATEST(CAST(FLOOR(
           (CASE WHEN v >= 0.0 THEN 0.5*sqrt(1.0 + 3.0*abs(v))
                 ELSE 1.0 - 0.5*sqrt(1.0 + 3.0*abs(v)) END) * {n}.0)
           AS BIGINT), 0), {n - 1}) AS j
  FROM s2fuv)""",
        f"""s2l0 AS (
  SELECT {keys}, face, i, j, CAST(0 AS BIGINT) AS pos, face & 1 AS orient
  FROM s2ij)""",
    ]
    for step in range(level):
        k = level - 1 - step
        p = (
            f"list_value({ij_to_pos})[orient*4 + ((i >> {k}) & 1)*2"
            f" + ((j >> {k}) & 1) + 1]"
        )
        parts.append(
            f"""s2l{step + 1} AS (
  SELECT {keys}, face, i, j,
         pos*4 + {p} AS pos,
         xor(orient, list_value({pos_to_orient})[{p} + 1]) AS orient
  FROM s2l{step})"""
        )
    parts.append(
        f"""s2cell AS (
  SELECT {keys}, (face << {2 * level}) | pos AS s2_cell
  FROM s2l{level})"""
    )
    return ",\n".join(parts)
