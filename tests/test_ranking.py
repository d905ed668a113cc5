"""BM25 ranking operator: hand-computed scores + contract checks."""

import math

from pyspark.sql import functions as F

from grandine_spark.operators.ranking import bm25_scores


def _bm25_term(tf, df, n_docs, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "c c c d")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(0, "a"), (1, "b c"), (2, "zzz")], "q_id long, query string"
    )
    out = {
        (r.q_id, r.doc_id): r.score
        for r in bm25_scores(docs, queries).collect()
    }
    n, avgdl = 3, (3 + 2 + 4) / 3
    # q0 "a": only d1 (tf=2, df=1)
    assert out[(0, 1)] == round(_bm25_term(2, 1, n, 3, avgdl), 6)
    assert (0, 2) not in out and (0, 3) not in out
    # q1 "b c": d1 matches b; d2 matches b and c; d3 matches c (tf=3)
    assert out[(1, 1)] == round(_bm25_term(1, 2, n, 3, avgdl), 6)
    assert out[(1, 2)] == round(
        _bm25_term(1, 2, n, 2, avgdl) + _bm25_term(1, 2, n, 2, avgdl), 6
    )
    assert out[(1, 3)] == round(_bm25_term(3, 2, n, 4, avgdl), 6)
    # q2 matches nothing
    assert not any(q == 2 for q, _ in out)


def test_bm25_case_and_duplicate_query_terms(spark):
    """Terms lowercase; duplicated query terms score once (bag-of-terms
    with distinct); empty docs never match."""
    docs = spark.createDataFrame(
        [(1, "Alpha beta"), (2, ""), (3, None)], "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [(0, "ALPHA alpha Alpha")], "q_id long, query string"
    )
    out = bm25_scores(docs, queries).collect()
    assert len(out) == 1 and out[0].doc_id == 1
    # one distinct term: score equals the single-term formula (N=1 doc
    # with tokens, dl=2, avgdl=2, tf=1, df=1)
    assert out[0].score == round(_bm25_term(1, 1, 1, 2, 2.0), 6)


def test_bm25_plan_broadcasts_queries_no_cartesian(spark):
    """Plan shape: the query-term join must be a broadcast hash join and
    the only nested-loop join allowed is the 1-row (N, avgdl) stats cross
    join — a real cartesian over (doc, term) x queries would be the
    scale-killer this operator is designed to avoid."""
    import contextlib
    import io
    import re

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} common word") for i in range(50)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(0, "common"), (1, "tok1 word")], "q_id long, query string"
    )
    plan_df = bm25_scores(docs, queries)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    # every nested-loop join in the plan must be the single-row stats side
    # (formatted explain prints each node twice — tree + detail — so count
    # distinct node ids, not raw matches)
    bnlj_ids = set(re.findall(r"BroadcastNestedLoopJoin[^\n]*\((\d+)\)", plan))
    assert len(bnlj_ids) <= 1, bnlj_ids
    assert "CartesianProduct" not in plan
