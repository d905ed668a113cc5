"""Text relevance ranking for data selection — Okapi BM25.

A training-data pipeline uses BM25 to pull query-relevant slices out of a
web corpus (e.g. seed-topic selection before DSIR reweighting, or eval-set
retrieval for decontamination audits). No reference counterpart (grandine
is a geo engine); public formulation: Robertson & Walker's Okapi BM25 as
given in the standard IR literature.

Scale (100 TB): everything is groupBy/join on (doc, term) / (q, doc) keys
— no WindowExec, no driver participation. The query table is broadcast by
construction (queries are human-scale); the per-term document-frequency
table is vocab-sized (AQE broadcasts it when Heaps-bounded, plain shuffle
join otherwise — the same honest fallback as operators.quality's
lm_perplexity); the corpus-wide (N, avgdl) pair is ONE row cross-joined
in. Matching against query terms happens BEFORE the df/dl joins, so only
the matched sliver of (doc, term) rows flows through the scoring joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS = r"\s+"


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id: str = "q_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every document against every query, for (q, doc)
    pairs sharing at least one term.

    Tokenization: lowercased whitespace split (the engine's standard
    contract); query terms de-duplicated per query (each distinct term
    scores once, the standard bag-of-terms query model). idf uses the
    +1-smoothed form ``ln(1 + (N - df + 0.5) / (df + 0.5))`` (always
    positive, the Lucene convention); ``N`` counts documents with at
    least one token. Output: (query_id, id_col, score) with score
    rounded to 6 dp — ties are NOT ranked here (a rank window would pin
    an arbitrary tie order; callers pick their own top-k policy).
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), _WS)
    tok_rows = docs.select(
        F.col(id_col), F.explode(toks).alias("term")
    ).filter(F.col("term") != "")
    tf = tok_rows.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok_rows.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    qterms = (
        queries.select(
            F.col(query_id),
            F.explode(
                F.split(F.trim(F.lower(F.col(query_col))), _WS)
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )

    matched = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, id_col)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        matched.withColumn("_s", idf * tf_part)
        .groupBy(query_id, id_col)
        .agg(F.round(F.sum("_s"), 6).alias("score"))
    )
