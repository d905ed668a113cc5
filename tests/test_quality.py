"""Decontamination + repetition stats: hand-built corpora with known answers."""

from pyspark.sql import functions as F

from grandine_spark.operators.quality import (
    contamination_hits,
    decontaminate,
    repetition_stats,
)


def test_decontaminate_flags_exact_and_partial_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a quick brown fox appears in this unrelated story"),  # shares 'quick brown fox'
            (3, "completely different words entirely here today now"),
            (4, "xy"),  # too short for any 3-gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text string"
    )
    out = {r.doc_id: r for r in decontaminate(docs, bench, k=3).collect()}
    assert out[1].is_contaminated and out[1].n_hits == 7  # all 7 of its 3-grams
    assert out[2].is_contaminated and out[2].n_hits == 1
    assert not out[3].is_contaminated and out[3].n_hits == 0
    assert not out[4].is_contaminated and out[4].n_hits == 0
    # min_hits raises the bar: the 1-gram-overlap doc survives
    strict = {r.doc_id: r.is_contaminated
              for r in decontaminate(docs, bench, k=3, min_hits=2).collect()}
    assert strict == {1: True, 2: False, 3: False, 4: False}
    # hits table only carries matching docs
    assert contamination_hits(docs, bench, k=3).count() == 2


def test_decontaminate_shuffle_path_matches_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, f"token{i} alpha beta gamma token{i + 1} delta") for i in range(30)],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") % 7 == 0).select("text")
    a = sorted((r.doc_id, r.n_hits) for r in decontaminate(docs, bench, k=3).collect())
    b = sorted(
        (r.doc_id, r.n_hits)
        for r in decontaminate(
            docs, bench, k=3, broadcast_contamination=False
        ).collect()
    )
    assert a == b and len(a) == 30


def test_repetition_stats_known_values(spark):
    docs = spark.createDataFrame(
        [
            # 4 lines, 2 distinct → dup_line_frac 0.5; 'spam spam' dominates
            (1, "spam spam spam spam\nok line\nspam spam spam spam\nok line"),
            # all-unique everything
            (2, "one two three four five six seven eight nine ten"),
            # 8 tokens, 4 5-grams all identical → dup_5gram_frac = 3/4
            (3, "a a a a a a a a"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert out[1].n_lines == 4 and abs(out[1].dup_line_frac - 0.5) < 1e-12
    assert out[1].is_repetitive
    assert out[2].dup_line_frac == 0.0 and out[2].dup_5gram_frac == 0.0
    # 9 bigrams, all distinct → top share 1/9
    assert abs(out[2].top_bigram_frac - 1 / 9) < 1e-12
    assert not out[2].is_repetitive
    assert abs(out[3].dup_5gram_frac - 0.75) < 1e-12
    assert abs(out[3].top_bigram_frac - 1.0) < 1e-12
    assert out[3].is_repetitive


def test_lm_perplexity_matches_bruteforce_incl_oov(spark):
    """Seeded differ: lm_perplexity equals the python unigram cross-entropy
    — self-trained AND with a separate reference model where scored docs
    contain OOV tokens (backed off to 1/N)."""
    import math
    import random
    from collections import Counter

    from grandine_spark.operators.quality import lm_perplexity

    rng = random.Random(77)
    vocab = [f"t{i}" for i in range(20)]
    model_rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(40)
    ]
    score_rows = [
        (
            100 + i,
            " ".join(
                rng.choice(vocab + ["oovword"]) for _ in range(rng.randint(0, 25))
            ),
        )
        for i in range(30)
    ] + [(999, ""), (998, "   ")]

    model_df = spark.createDataFrame(model_rows, "doc_id long, text string")
    score_df = spark.createDataFrame(score_rows, "doc_id long, text string")

    cnt = Counter(t for _, txt in model_rows for t in txt.lower().split())
    N = sum(cnt.values())

    def brute(rows, c, n):
        out = {}
        for d, txt in rows:
            ts = txt.strip().lower().split()
            if not ts:
                out[d] = (0, None, None)
                continue
            h = -sum(math.log2(c.get(t, 1) / n) for t in ts) / len(ts)
            out[d] = (len(ts), round(h, 6), round(2**h, 6))
        return out

    # separate reference model (exercises OOV backoff)
    got = {
        r.doc_id: (r.n_tokens, r.cross_entropy, r.perplexity)
        for r in lm_perplexity(score_df, model_df=model_df).collect()
    }
    assert got == brute(score_rows, cnt, N)
    assert any("oovword" in t for _, t in score_rows)  # OOV path exercised

    # self-trained on its own corpus
    cnt2 = Counter(t for _, txt in score_rows for t in txt.lower().split())
    N2 = sum(cnt2.values())
    got2 = {
        r.doc_id: (r.n_tokens, r.cross_entropy, r.perplexity)
        for r in lm_perplexity(score_df).collect()
    }
    assert got2 == brute(score_rows, cnt2, N2)


def test_quality_buckets_deterministic_terciles(spark):
    """Per-language NTILE semantics: bucket sizes differ by at most one per
    language, ordering is by (perplexity, id), empty docs get NULL bucket,
    and a rerun under a different partitioning yields the identical
    assignment (the deterministic tie-break at work)."""
    import random

    from grandine_spark.operators.quality import quality_buckets

    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(15)]
    rows = []
    for i in range(50):
        lang = ["en", "de", "fr"][i % 3]
        n = rng.randint(0, 20)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n)), lang))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    out = quality_buckets(docs).collect()
    by_lang = {}
    for r in out:
        if r.bucket is None:
            assert r.perplexity is None
            continue
        by_lang.setdefault(r.lang, []).append((r.perplexity, r.doc_id, r.bucket))
    for lang, items in by_lang.items():
        items.sort()
        # buckets are contiguous + non-decreasing in (perplexity, id) order
        assert [b for _, _, b in items] == sorted(b for _, _, b in items)
        sizes = [sum(1 for it in items if it[2] == k) for k in (1, 2, 3)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)

    rerun = quality_buckets(docs.repartition(7, "lang")).collect()
    assert {(r.doc_id, r.bucket) for r in rerun} == {
        (r.doc_id, r.bucket) for r in out
    }


def test_importance_weights_matches_bruteforce(spark):
    """Seeded differ for the DSIR weighting: tagged-union model counts and
    per-doc log-ratio sums equal the python computation, including OOV-in-
    target backoff, spam downweighting, and empty docs."""
    import math
    import random
    from collections import Counter

    from grandine_spark.operators.quality import importance_weights

    rng = random.Random(31)
    good = [f"g{i}" for i in range(10)]
    bad = [f"b{i}" for i in range(10)]
    bg_rows = []
    for i in range(60):
        pool = good if i % 3 == 0 else (good + bad)
        n = rng.randint(0, 25)
        bg_rows.append((i, " ".join(rng.choice(pool) for _ in range(n))))
    tgt_rows = [
        (1000 + i, " ".join(rng.choice(good) for _ in range(rng.randint(3, 20))))
        for i in range(15)
    ]
    bg = spark.createDataFrame(bg_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.log2_weight)
        for r in importance_weights(bg, tgt).collect()
    }
    ct = Counter(t for _, x in tgt_rows for t in x.lower().split())
    cb = Counter(t for _, x in bg_rows for t in x.strip().lower().split())
    nt, nb = sum(ct.values()), sum(cb.values())
    for d, x in bg_rows:
        ts = x.strip().lower().split() if x.strip() else []
        if not ts:
            assert got[d] == (0, None)
            continue
        w = sum(
            math.log2(max(ct.get(t, 0), 1) / nt)
            - math.log2(max(cb.get(t, 0), 1) / nb)
            for t in ts
        )
        assert got[d] == (len(ts), round(w, 6)), d
    # good-token docs must outrank mixed docs on average
    pure = [got[d][1] / got[d][0] for d, _ in bg_rows if d % 3 == 0 and got[d][0]]
    mixed = [got[d][1] / got[d][0] for d, _ in bg_rows if d % 3 != 0 and got[d][0]]
    assert sum(pure) / len(pure) > sum(mixed) / len(mixed)


def test_scoring_ops_plans_stay_jvm_side(spark):
    """lm_perplexity and importance_weights must compile to pure JVM plans:
    no Python evaluation anywhere (the log2/backoff chain is codegen), and
    the model build is a partial/final hash aggregate, not a window."""
    from grandine_spark.operators.quality import importance_weights, lm_perplexity

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )
    for df in (
        lm_perplexity(docs),
        importance_weights(docs, docs.filter("doc_id = 1")),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan, plan
        assert "Window" not in plan.replace("WindowGroupLimit", ""), plan
        assert "HashAggregate" in plan, plan
