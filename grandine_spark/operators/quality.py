"""Corpus-quality operators: eval-set decontamination + repetition stats.

Two passes every serious training-data pipeline runs that are neither
dedup (operators/dedup.py) nor per-doc scoring (functions/text.py):

- **decontaminate**: remove documents that overlap an evaluation set.
  The standard recipe is k-gram collision (k≈13 words): any doc sharing
  at least ``min_hits`` distinct k-grams with the benchmark text is
  flagged. Scale shape: the contamination side is tiny next to the
  corpus (benchmarks are ~10^5-10^7 grams vs 10^12 docs), so its
  distinct gram-hash set is broadcast; the corpus side is ONE explode →
  broadcast semi-ish inner join → one groupBy(doc) shuffle of only the
  matching grams (at real contamination rates, a sliver). Set
  ``broadcast_contamination=False`` for a pathologically large banned
  set and both sides shuffle on the gram hash instead.

- **repetition_stats**: Gopher-style repetitiveness signals — duplicate
  -line fraction, the most-frequent-bigram share, duplicate-5-gram
  fraction. Line and 5-gram stats are pure array expressions (zero
  shuffle); the top-bigram share needs a per-(doc, gram) count, which is
  explode → ONE partial-agg shuffle keyed by (doc, gram) → per-doc max
  (HOF in-array counting would be the interpreted-expression
  anti-pattern; the explode keeps it in codegen + hash aggregates).

No reference parity (grandine has no text ops) — BASELINE training-
pipeline extensions, axes pyspark × webtext.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TXT


def _gram_hashes(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, gram_hash) — one row per k-gram occurrence, 60-bit md5 ints
    (same hash family as the MinHash chain, so oracles share SQL)."""
    return df.select(
        F.col(id_col),
        F.explode(
            TXT.shingle_hashes(TXT.word_shingles(F.col(text_col), k))
        ).alias("gram"),
    )


def contamination_hits(
    docs: DataFrame,
    contamination: DataFrame,
    k: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    contam_text_col: str = "text",
    broadcast_contamination: bool = True,
) -> DataFrame:
    """(id, n_hits) for every doc with ≥1 distinct k-gram shared with the
    contamination set; docs with zero hits are absent."""
    banned = (
        _gram_hashes(
            contamination.select(F.col(contam_text_col)).withColumn("_i", F.lit(0)),
            "_i",
            contam_text_col,
            k,
        )
        .select("gram")
        .distinct()
    )
    if broadcast_contamination:
        banned = F.broadcast(banned)
    return (
        _gram_hashes(docs, id_col, text_col, k)
        .join(banned, "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    contamination: DataFrame,
    k: int = 13,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    contam_text_col: str = "text",
    broadcast_contamination: bool = True,
) -> DataFrame:
    """Docs labeled with (n_hits, is_contaminated);
    ``filter(~is_contaminated)`` is the clean corpus. One extra left join
    against the (match-sized) hits table."""
    hits = contamination_hits(
        docs, contamination, k, id_col, text_col, contam_text_col,
        broadcast_contamination,
    )
    return (
        docs.join(hits, id_col, "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)))
        .withColumn("is_contaminated", F.col("n_hits") >= min_hits)
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_top_bigram_frac: float = 0.20,
    max_dup_5gram_frac: float = 0.15,
) -> DataFrame:
    """Per-doc repetitiveness: (id, n_lines, dup_line_frac,
    top_bigram_frac, dup_5gram_frac, is_repetitive). Fractions are 0.0
    when the doc is too short to have the unit (no lines / bigrams /
    5-grams). Threshold defaults follow the published Gopher ranges;
    the flag is an OR over the three signals."""
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0,
        1.0 - F.size(F.array_distinct(lines)) / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    g5 = TXT.word_shingles(F.col(text_col), 5)
    n5 = F.size(g5)
    dup5 = F.when(
        n5 > 0, 1.0 - F.size(F.array_distinct(g5)) / n5.cast("double")
    ).otherwise(F.lit(0.0))
    base = docs.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        dup_line.alias("dup_line_frac"),
        dup5.alias("dup_5gram_frac"),
    )

    big = (
        _gram_hashes(docs, id_col, text_col, 2)
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            (F.max("c") / F.sum("c")).alias("top_bigram_frac"),
        )
    )
    out = base.join(big, id_col, "left").withColumn(
        "top_bigram_frac", F.coalesce("top_bigram_frac", F.lit(0.0))
    )
    return out.select(
        id_col,
        "n_lines",
        "dup_line_frac",
        "top_bigram_frac",
        "dup_5gram_frac",
        (
            (F.col("dup_line_frac") > max_dup_line_frac)
            | (F.col("top_bigram_frac") > max_top_bigram_frac)
            | (F.col("dup_5gram_frac") > max_dup_5gram_frac)
        ).alias("is_repetitive"),
    )


def lm_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model_df: DataFrame | None = None,
    model_text_col: str | None = None,
) -> DataFrame:
    """CCNet/KenLM-style language-model quality score, unigram formulation:
    train a unigram token model on ``model_df`` (default: the corpus itself)
    and score every document by cross-entropy under it — the standard
    quality-bucketing signal (low perplexity = looks like the reference
    corpus; high = boilerplate soup, lists, noise).

    Model: p(tok) = c(tok) / N over the whitespace-lowercase token stream,
    with unseen tokens (possible only when ``model_df`` is a separate
    reference corpus) backed off to 1 / N. Per document:
    ``cross_entropy = -(1/n) Σ log2 p(tok_i)``, ``perplexity = 2^H``.

    Returns (id_col, n_tokens, cross_entropy, perplexity), both scores
    rounded to 6 dp; empty documents score NULL.

    Scale (100 TB): the model is ONE groupBy over exploded tokens
    (map-side partial agg collapses Zipf skew the same way it collapses
    boilerplate in :func:`substring_dup_stats`); scoring is an equi-join of
    the exploded corpus against the model keyed by token — natural-language
    vocabularies are ~10^6-10^8 rows even at web scale (Heaps' law), so AQE
    broadcasts the model side, leaving tokenize → broadcast-join → one
    groupBy(doc) shuffle. log2 stays in codegen; no Python anywhere.
    """
    toks_src = model_df if model_df is not None else df
    tcol = model_text_col or text_col
    model_toks = toks_src.select(
        F.explode(
            F.split(F.trim(F.lower(F.col(tcol))), r"\s+")
        ).alias("tok")
    ).filter(F.col("tok") != "")
    model = model_toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_c"))
    # total N via a 1-row aggregate joined in by cross join (broadcast, free)
    total = model_toks.select(F.count(F.lit(1)).alias("_n_model"))

    doc_toks = df.select(
        F.col(id_col),
        F.explode_outer(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    scored = (
        doc_toks.join(model, "tok", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.col("tok"),
            # -log2 p with 1/N backoff for OOV (c is NULL on OOV);
            # log(N/c) = log N - log c keeps both operands exact longs
            F.when(
                F.col("tok").isNull(), F.lit(None).cast("double")
            ).otherwise(
                (
                    F.log2(F.col("_n_model").cast("double"))
                    - F.log2(F.coalesce(F.col("_c"), F.lit(1)).cast("double"))
                )
            ).alias("_nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.col("tok")).alias("n_tokens"),
        F.round(F.avg("_nll"), 6).alias("cross_entropy"),
        F.round(F.pow(F.lit(2.0), F.avg("_nll")), 6).alias("perplexity"),
    )


def quality_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet's head/middle/tail split: score every document with
    :func:`lm_perplexity` and assign per-language perplexity ``n_buckets``
    -tiles (bucket 1 = lowest perplexity = highest quality). Ties are broken
    by ``id_col`` so the assignment is deterministic across partitionings
    and engines. Documents with NULL perplexity (empty) get bucket NULL.

    Scale (100 TB): one extra shuffle over (lang) for the ntile window on
    top of lm_perplexity's plan. Languages are a ~10^2-cardinality key with
    real skew (English half the web) — but the window carries only
    (id, lang, perplexity) rows, and NTILE streams its partition (rank
    state only), so the hot language is sort-bound, not memory-bound; at
    cluster scale the per-language sort is a spillable range sort.
    """
    from pyspark.sql import Window

    scored = lm_perplexity(df, id_col=id_col, text_col=text_col).join(
        df.select(F.col(id_col), F.col(lang_col)), id_col
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.col("perplexity").asc(), F.col(id_col).asc()
    )
    # NTILE's bucket boundaries depend on the partition's ROW COUNT, so the
    # NULL-perplexity rows must be excluded BEFORE the window (not masked
    # after) — also sidesteps the Spark-nulls-first vs SQL-nulls-last
    # ordering divergence.
    buckets = (
        scored.filter(F.col("perplexity").isNotNull())
        .select(F.col(id_col), F.ntile(n_buckets).over(w).alias("bucket"))
    )
    return scored.join(buckets, id_col, "left").select(
        F.col(id_col),
        F.col(lang_col),
        F.col("n_tokens"),
        F.col("perplexity"),
        F.col("bucket"),
    )


def importance_weights(
    df: DataFrame,
    target_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str | None = None,
) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", unigram formulation):
    score every document by how much more likely its token stream is under
    a TARGET distribution (e.g. curated/high-quality text, ``target_df``)
    than under the BACKGROUND distribution (the corpus itself) —
    ``log2_weight = Σ_tok [log2 p_tgt(tok) - log2 p_bg(tok)]``, with 1/N
    backoff per side for unseen tokens. Sampling ∝ 2^log2_weight yields
    the importance-resampled training mix; rank-descending gives "most
    target-like" selection.

    Returns (id_col, n_tokens, log2_weight), weight rounded to 6 dp;
    empty documents get NULL weight.

    Scale (100 TB): both unigram models come from ONE groupBy over the
    tagged union of target and background token streams (conditional
    aggregates — no second scan, no join of two model tables); scoring is
    a single token equi-join against that combined vocabulary (broadcast
    at any realistic vocab size) plus one per-doc aggregate. Same skeleton
    as :func:`lm_perplexity`; everything stays in codegen.
    """
    tcol = target_text_col or text_col

    def _toks(frame: DataFrame, col: str, tag: int) -> DataFrame:
        return frame.select(
            F.explode(
                F.filter(
                    F.split(F.trim(F.lower(F.col(col))), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("tok"),
            F.lit(tag).alias("_tgt"),
        )

    stream = _toks(target_df, tcol, 1).unionByName(_toks(df, text_col, 0))
    model = stream.groupBy("tok").agg(
        F.sum("_tgt").alias("_ct"),
        F.sum(F.lit(1) - F.col("_tgt")).alias("_cb"),
    )
    totals = stream.select(
        F.sum("_tgt").alias("_nt"),
        F.sum(F.lit(1) - F.col("_tgt")).alias("_nb"),
    )

    doc_toks = df.select(
        F.col(id_col),
        F.explode_outer(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    scored = (
        doc_toks.join(model, "tok", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.col("tok"),
            F.when(F.col("tok").isNull(), F.lit(None).cast("double")).otherwise(
                # log2(c_t/N_t) - log2(c_b/N_b), zero counts backed off to 1
                (
                    F.log2(F.greatest(F.coalesce(F.col("_ct"), F.lit(0)), F.lit(1)).cast("double"))
                    - F.log2(F.col("_nt").cast("double"))
                )
                - (
                    F.log2(F.greatest(F.coalesce(F.col("_cb"), F.lit(0)), F.lit(1)).cast("double"))
                    - F.log2(F.col("_nb").cast("double"))
                )
            ).alias("_lr"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.col("tok")).alias("n_tokens"),
        F.round(F.sum("_lr"), 6).alias("log2_weight"),
    )
