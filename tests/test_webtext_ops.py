"""Dedup / similarity / text-function operators on the driver testdata tables."""

import math

import pytest
from pyspark.sql import functions as F

from grandine_spark.functions import text as TXT
from grandine_spark.operators.dedup import (
    dedup_exact,
    dedup_exact_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_buckets,
)
from grandine_spark.operators.multimodal import (
    extract_media_features,
    extract_media_metadata,
)
from grandine_spark.operators.similarity import brute_force_topk, lsh_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_dedup_exact_groups(spark, docs):
    groups = dedup_exact(docs).collect()
    assert sum(r.n_docs for r in groups) == docs.count()
    pairs = dedup_exact_pairs(docs)
    n_dups = docs.count() - len(groups)
    assert pairs.count() == n_dups


def test_minhash_lsh_finds_exact_dups(spark, docs):
    """Exact duplicates always share every band → must appear as candidates."""
    dup_pairs = {
        (min(r.dup_id, r.keeper_id), max(r.dup_id, r.keeper_id))
        for r in dedup_exact_pairs(docs).collect()
    }
    if not dup_pairs:
        pytest.skip("no exact dups at this sf")
    cand = {
        (r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, n_perm=8, band_size=2).collect()
    }
    missing = {
        p
        for p in dup_pairs
        if p not in cand
    }
    assert not missing


def test_ngram_jaccard_selfconsistency(spark, docs):
    out = ngram_jaccard_pairs(docs.limit(100), threshold=0.5).collect()
    for r in out:
        assert 0.5 <= r.jaccard <= 1.0
        assert r.id_a < r.id_b


def test_simhash_deterministic(spark, docs):
    a = {(r.doc_id, r.simhash) for r in simhash_buckets(docs.limit(50)).collect()}
    b = {(r.doc_id, r.simhash) for r in simhash_buckets(docs.limit(50)).collect()}
    assert a == b
    assert all(0 <= s < (1 << 32) for _, s in a)


def test_text_functions(spark, docs):
    row = (
        docs.limit(20)
        .select(
            "doc_id",
            TXT.token_count_ws(F.col("text")).alias("n_tok"),
            TXT.quality_score(F.col("text")).alias("q"),
            TXT.lang_id(F.col("text")).alias("lang_pred"),
            TXT.doc_fingerprint(F.col("text")).alias("fp"),
            F.length("text").alias("n_chars"),
        )
        .collect()
    )
    for r in row:
        assert r.n_tok > 0
        assert 0.0 <= r.q <= 1.0
        assert r.lang_pred in {"en", "de", "fr", "es", "pt", "und"}
        assert 0 <= r.fp < (1 << 31)


def test_brute_force_topk(spark, embs):
    queries = embs.limit(3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding")
    )
    out = brute_force_topk(embs, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append((r.rank, r.vec_id))
    assert set(by_q) == {0, 1, 2}
    for q, lst in by_q.items():
        assert sorted(x[0] for x in lst) == [1, 2, 3, 4, 5]
        assert q not in {x[1] for x in lst}  # self excluded


def test_cosine_vec_round6_parity_with_hof(spark):
    """cosine_vec (the Arrow scoring kernel) must agree with the
    cosine_expr HOF fold within the engine's numeric contract: every
    oracle-facing query rounds cosine to 6 dp before output, so the two
    paths must be round-6 identical and within a few ulps raw. (They are
    NOT bit-identical — numpy's reduction is unrolled/pairwise even at
    dim 8, unlike F.aggregate's strict left fold; measured ~1e-16
    relative.) Exercised per-dim (homogeneous batches, as in real use)
    at the engine's dim (64) and neighbors, on adversarial values with
    a large magnitude spread so summation order actually matters."""
    import math

    from grandine_spark.operators.similarity import cosine_expr, cosine_vec

    rng = __import__("numpy").random.default_rng(7)
    for dim in (8, 64, 128):
        rows = []
        for i in range(40):
            a = (rng.standard_normal(dim) * 10.0 ** rng.integers(-6, 7, dim)).tolist()
            b = (rng.standard_normal(dim) * 10.0 ** rng.integers(-6, 7, dim)).tolist()
            rows.append((i, a, b))
        df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
        out = df.select(
            cosine_expr(F.col("a"), F.col("b")).alias("hof"),
            cosine_vec(F.col("a"), F.col("b")).alias("vec"),
        ).collect()
        assert len(out) == 40
        for r in out:
            assert round(r.hof, 6) == round(r.vec, 6), (dim, r.hof, r.vec)
            # raw values a few ulps apart at most (cosine magnitudes can be
            # tiny under the adversarial spread, so bound relative error)
            scale = max(abs(r.hof), abs(r.vec), 1e-300)
            assert math.isclose(r.hof, r.vec, rel_tol=1e-12), (dim, r.hof, r.vec)
            assert abs(r.hof - r.vec) / scale < 1e-12


def test_lsh_topk_recall(spark, embs):
    dim = len(embs.first().embedding)
    queries = embs.limit(5).select(F.col("vec_id").alias("q_id"), "embedding")
    exact = brute_force_topk(embs, queries, k=3)
    approx = lsh_topk(embs, queries, dim=dim, k=3, n_tables=16, bits=4)
    e = {(r.q_id, r.vec_id) for r in exact.collect()}
    a = {(r.q_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6  # 16 tables x 4 bits at p~0.6 → expected ~0.9


def test_multimodal_metadata_and_features(spark):
    from grandine_spark.sources import synth

    pages = synth.pages(spark, 200)
    meta = extract_media_metadata(pages).collect()
    assert len(meta) == 200
    assert all(r.media_type == "text/html" for r in meta)
    assert all(r.n_bytes > 0 and len(r.sha) == 64 for r in meta)

    feats = extract_media_features(pages, dim=8).collect()
    assert len(feats) == 200
    for r in feats:
        assert len(r.feat) == 8
        assert abs(sum(r.feat) - 1.0) < 1e-6  # histogram normalized


def test_decode_stub_raises():
    from grandine_spark.operators.multimodal import decode_image_stub

    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\xff\xd8\xff")


def test_ivf_probe_all_equals_bruteforce(spark):
    import pyspark.sql.functions as F

    from grandine_spark.operators.similarity import brute_force_topk, ivf_topk

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    bf = {(r.q_id, r.vec_id, r.rank) for r in brute_force_topk(embs, q, k=5).collect()}
    ivf = {
        (r.q_id, r.vec_id, r.rank)
        for r in ivf_topk(embs, q, dim=64, k=5, n_centroids=4, n_probe=4).collect()
    }
    assert ivf == bf


def test_ivf_partial_probe_subset(spark):
    """n_probe < n_centroids: approximate — every returned neighbor must
    still be a true vector id and per-query results stay ranked."""
    import pyspark.sql.functions as F

    from grandine_spark.operators.similarity import ivf_topk

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    out = ivf_topk(embs, q, dim=64, k=5, n_centroids=8, n_probe=2).collect()
    assert len(out) > 0
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_html_extract_byte_identical_per_url(spark):
    """BASELINE invariant: text recovered from the html column is
    byte-identical (sha256) per url to the carried text column, modulo the
    extractor's documented whitespace normalization (synth text may carry a
    trailing space when no geotag was appended — markup cannot preserve
    it)."""
    import pyspark.sql.functions as F

    from grandine_spark.functions.text import extract_text_from_html
    from grandine_spark.sources import synth

    pages = synth.pages(spark, 500)
    mismatch = (
        pages.select(
            "url",
            F.sha2(F.trim(F.col("text")), 256).alias("a"),
            F.sha2(extract_text_from_html(F.col("html")), 256).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    assert mismatch == 0


def test_sample_frames_plumbing(spark):
    """mapInPandas frame sampling: n rows per blob, deterministic bytes."""
    import pyspark.sql.functions as F

    from grandine_spark.operators.multimodal import sample_frames
    from grandine_spark.sources import synth

    pages = synth.pages(spark, 50)
    out = sample_frames(pages, id_col="url", bin_col="html", n_frames=4)
    rows = out.collect()
    assert len(rows) == 50 * 4
    by_id = {}
    for r in rows:
        by_id.setdefault(r.doc_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_id.values())
    # deterministic: two runs agree byte-for-byte
    again = {(r.doc_id, r.frame_idx): bytes(r.frame) for r in out.collect()}
    first = {(r.doc_id, r.frame_idx): bytes(r.frame) for r in rows}
    assert first == again


def test_dedup_exact_pairs_window(spark, docs):
    """Pairs op: every non-keeper maps to its group's min id; plan must be a
    single exchange (window), never a broadcast of the keeper table."""
    from grandine_spark.operators.dedup import dedup_exact_pairs

    got = {(r.dup_id, r.keeper_id) for r in dedup_exact_pairs(docs).collect()}
    groups = {}
    for r in docs.select("doc_id", "text").collect():
        groups.setdefault(r.text, []).append(r.doc_id)
    want = {
        (d, min(ids)) for ids in groups.values() for d in ids if d != min(ids)
    }
    assert got == want


def test_ngram_jaccard_shingle_cap_drops_boilerplate(spark):
    """A shingle shared by every doc would drive a quadratic self-join; the
    df-cap must remove exactly the boilerplate-driven pairs."""
    from grandine_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved worldwide"
    rows = [(i, f"unique words {i} xx{i} yy{i} " + boiler) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # uncapped (explicit None — the cap is now on by default): the 4
    # boilerplate tokens yield shared shingles -> pairs exist
    uncapped = ngram_jaccard_pairs(
        docs, shingle_k=3, threshold=0.1, max_shingle_freq=None
    ).count()
    assert uncapped > 0
    # capped at freq 5: shingles in all 20 docs are dropped; the remaining
    # shingles are doc-unique, so no pair survives
    capped = ngram_jaccard_pairs(
        docs, shingle_k=3, threshold=0.1, max_shingle_freq=5
    ).count()
    assert capped == 0


def test_ngram_jaccard_default_cap_survives_boilerplate(spark):
    """The DEFAULT config must survive a synthetic boilerplate corpus: 300
    docs all sharing one phrase (shingle df=300 > the default cap of 256).
    With the old None default this self-join produced ~300²/2 ≈ 45k
    intermediate rows from the boilerplate shingles alone; the default cap
    drops them before the join, leaving only doc-unique shingles → 0 pairs."""
    from grandine_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "subscribe to our newsletter for updates"
    rows = [(i, f"unique words {i} xx{i} yy{i} " + boiler) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.1).count() == 0


def test_cap_buckets_anti_join_exact(spark):
    from grandine_spark.operators.skew import cap_buckets

    rows = [(i, "hot") for i in range(10)] + [(i, f"cold{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "id long, bucket string")
    kept = cap_buckets(df, "bucket", 5).collect()
    assert {r.bucket for r in kept} == {f"cold{i}" for i in range(4)}


def test_chunk_documents_windows(spark):
    from grandine_spark.operators.chunking import chunk_documents

    rows = [
        (1, "a b c d e f g h i j"),  # 10 tokens
        (2, "x y"),  # shorter than one chunk
        (3, "   "),  # zero tokens -> no rows
        (4, "p  q\t r\n s"),  # mixed whitespace
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_text)
        for r in chunk_documents(docs, chunk_tokens=4, stride=3).collect()
    }
    assert got[(1, 0)] == (4, "a b c d")
    assert got[(1, 1)] == (4, "d e f g")
    assert got[(1, 2)] == (4, "g h i j")
    assert got[(1, 3)] == (1, "j")  # final short window
    assert got[(2, 0)] == (2, "x y")
    assert got[(4, 0)] == (4, "p q r s")
    assert got[(4, 1)] == (1, "s")  # stride 3 over 4 tokens -> second window
    assert not any(d == 3 for d, _ in got)
    assert len(got) == 7


def test_chunk_documents_no_shuffle_plan(spark):
    """Chunking must stay map-side: tokenize -> sequence -> explode ->
    slice, zero Exchange nodes and zero Python stages."""
    import contextlib
    import io
    import re

    from grandine_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    df = chunk_documents(docs, chunk_tokens=4, stride=3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert not re.findall(r"\bExchange \(\d+\)", plan)
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "MapInArrow"):
        assert node not in plan


def test_pack_chunks_concat_slice_rule(spark):
    from grandine_spark.operators.chunking import pack_chunks

    # single shard (n_shards=1) so the stream order is just (doc, chunk)
    rows = [
        (1, 0, 40),
        (1, 1, 40),  # starts at 40 -> pack 0 (first token rule), runs over
        (2, 0, 50),  # starts at 80 -> pack 1, offset 16
        (3, 0, 64),  # starts at 130 -> pack 2, offset 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx long, n_tokens long")
    got = {
        (r.doc_id, r.chunk_idx): (r.shard, r.pack_id, r.pack_offset)
        for r in pack_chunks(df, seq_len=64, n_shards=1).collect()
    }
    assert got[(1, 0)] == (0, 0, 0)
    assert got[(1, 1)] == (0, 0, 40)
    assert got[(2, 0)] == (0, 1, 16)
    assert got[(3, 0)] == (0, 2, 2)


def test_pack_chunks_one_exchange_and_shard_determinism(spark):
    import contextlib
    import io
    import re

    from grandine_spark.operators.chunking import chunk_documents, pack_chunks

    rows = [(i, " ".join(f"t{i}w{j}" for j in range(20))) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    packed = pack_chunks(chunk_documents(docs, chunk_tokens=8, stride=8), seq_len=32)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        packed.explain("formatted")
    plan = buf.getvalue()
    assert len(set(re.findall(r"\bExchange \(\d+\)", plan))) == 1
    a = sorted(map(tuple, packed.collect()))
    b = sorted(map(tuple, packed.collect()))
    assert a == b  # md5 shard + (doc, chunk) order: fully deterministic
    # every pack's offsets are consistent: offset == cumsum within pack
    from collections import defaultdict

    by_pack = defaultdict(list)
    for r in packed.collect():
        by_pack[(r.shard, r.pack_id)].append((r.doc_id, r.chunk_idx, r.n_tokens, r.pack_offset))
    for rows_ in by_pack.values():
        rows_.sort()
        assert rows_[0][3] < 32  # first chunk of a pack starts inside it


def test_pack_chunks_default_shards_scale_with_config(spark):
    """The n_shards default tracks spark.sql.shuffle.partitions (the
    packing window has exactly n_shards partitions, so a fixed literal
    default would cap the stage regardless of cluster size); an explicit
    n_shards still pins the shard layout for reproducibility."""
    from grandine_spark.operators.chunking import chunk_documents, pack_chunks

    rows = [(i, " ".join(f"d{i}w{j}" for j in range(8))) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = chunk_documents(docs, chunk_tokens=8, stride=8)
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "24")
        shards = {
            r.shard
            for r in pack_chunks(chunks, seq_len=32)
            .select("shard")
            .distinct()
            .collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert 0 <= min(shards) and max(shards) < 24
    assert len(shards) > 8  # the old fixed default capped the stage at 8
    shards4 = {
        r.shard
        for r in pack_chunks(chunks, seq_len=32, n_shards=4)
        .select("shard")
        .distinct()
        .collect()
    }
    assert shards4 <= {0, 1, 2, 3}


def test_dedup_incremental_exact_near_and_null(spark):
    from grandine_spark.operators.dedup import dedup_incremental

    base = "the quick brown fox jumps over the lazy dog again and again"
    standing = spark.createDataFrame(
        [(0, base), (2, "completely different standing content here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, base),  # exact duplicate of standing 0 -> dropped
            (3, base + " extra"),  # near-dup (shares most shingles) -> dropped
            (5, "unrelated fresh snapshot words nothing shared at all"),
            (7, None),  # NULL text: never an exact match, no shingles
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id
        for r in dedup_incremental(new, standing, n_perm=4, band_size=2).collect()
    }
    assert got == {5, 7}
    # near_dup=False keeps the near-duplicate (exact check only)
    got2 = {
        r.doc_id
        for r in dedup_incremental(
            new, standing, n_perm=4, band_size=2, near_dup=False
        ).collect()
    }
    assert got2 == {3, 5, 7}


def test_normalize_text_nfc_and_control_strip(spark):
    import unicodedata

    from grandine_spark.functions.text import normalize_text

    rows = [
        (1, "Café\x07 ok\ttab\nline"),  # decomposed accent + BEL
        (2, None),
        (3, "plain ascii"),
        (4, "\x00\x1f\x7fedges"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r.id: r.n for r in df.select("id", normalize_text(F.col("t")).alias("n")).collect()}
    assert got[1] == "Café ok\ttab\nline"  # composed, BEL gone, \t \n kept
    assert got[1][3] == "é" and unicodedata.is_normalized("NFC", got[1])
    assert got[2] is None
    assert got[3] == "plain ascii"
    assert got[4] == "edges"


def test_chunk_documents_lossless_reassembly(spark):
    """Property: at stride == chunk_tokens (no overlap), concatenating a
    doc's chunks in chunk_idx order reproduces its whitespace-normalized
    token stream exactly, and n_tokens sums to the doc's token count —
    chunking loses nothing and duplicates nothing. Seeded corpus with
    messy whitespace, unicode, and size straddling chunk boundaries."""
    import random

    from grandine_spark.operators.chunking import chunk_documents

    rng = random.Random(99)
    rows = []
    for i in range(60):
        n = rng.choice([0, 1, 7, 8, 9, 15, 16, 17, 40])
        seps = [" ", "  ", "\t", "\n", " \t "]
        text = ""
        for j in range(n):
            text += f"w{i}_{j}é" + rng.choice(seps)
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.n_tokens, r.chunk_text))
    for i, text in rows:
        toks = text.split()
        if not toks:
            assert i not in by_doc
            continue
        chunks = sorted(by_doc[i])
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        assert sum(c[1] for c in chunks) == len(toks)
        assert " ".join(c[2] for c in chunks) == " ".join(toks)


def test_substring_dup_stats_matches_bruteforce(spark):
    """Seeded differ: substring_dup_stats equals a brute-force python
    computation (window counts over the whole corpus, merged interval
    coverage) on a corpus engineered for every edge: cross-doc shared spans,
    self-repetition inside one doc, overlapping and disjoint dup spans,
    docs shorter than the window, and empty text."""
    import random
    from collections import Counter

    from grandine_spark.operators.dedup import substring_dup_stats

    rng = random.Random(4242)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> natural collisions
    rows = []
    for i in range(80):
        n = rng.choice([0, 2, 4, 5, 9, 20, 35])
        toks = [rng.choice(vocab) for _ in range(n)]
        if i % 7 == 0 and n >= 10:
            toks[2:7] = ["shared", "span", "of", "five", "tokens"]
        if i % 11 == 0 and n >= 12:
            toks[-5:] = toks[:5]  # self-repeat
        rows.append((i, " ".join(toks)))
    W = 5
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_windows, r.n_dup_windows, r.dup_tokens, r.dup_frac)
        for r in substring_dup_stats(docs, window=W).collect()
    }

    toks = {d: (t.strip().lower().split() if t.strip() else []) for d, t in rows}
    wins = {
        d: [" ".join(t[i : i + W]) for i in range(len(t) - W + 1)]
        for d, t in toks.items()
    }
    cnt = Counter(w for ws in wins.values() for w in ws)
    assert set(got) == set(toks)
    for d, t in toks.items():
        starts = [i for i, w in enumerate(wins[d]) if cnt[w] >= 2]
        cov = set()
        for s in starts:
            cov.update(range(s, s + W))
        want = (
            len(t),
            len(wins[d]),
            len(starts),
            len(cov),
            round(len(cov) / max(len(t), 1), 6),
        )
        assert got[d] == want, (d, got[d], want)
    # the engineered corpus must actually exercise the dup paths
    assert any(g[2] > 0 for g in got.values())
    assert any(g[1] > 0 and g[2] == 0 for g in got.values())


def test_substring_dup_stats_plan_uses_partial_agg_not_window(spark):
    """The corpus-wide occurrence count must be a groupBy (map-side partial
    aggregation collapses boilerplate skew) joined back — NOT a count() over
    a win-partitioned window, which would buffer the hottest window's entire
    partition. Assert the physical plan has no Window operator and does have
    a partial/final HashAggregate pair on the window text."""
    from grandine_spark.operators.dedup import substring_dup_stats

    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    plan = substring_dup_stats(docs, window=5)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan.split("AdaptiveSparkPlan")[0].replace(
        "WindowGroupLimit", ""
    ), plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan, plan


def test_substring_dedup_clean_spans_and_edges(spark):
    """Removal half of the Lee et al. pass: tokens covered by corpus-
    duplicated windows drop (case-insensitive window equality, original-
    case output), short/empty/NULL docs keep their contracts, and
    kept_tokens + dup coverage = n_tokens."""
    import pytest as _pytest

    from grandine_spark.operators.dedup import substring_dedup_clean

    boiler = "alpha bravo charlie delta"  # 4-token window, duplicated
    rows = [
        (1, f"{boiler} unique one text here"),
        (2, f"{boiler.upper()} other tail words two"),  # case-insensitive dup
        (3, "totally distinct content nothing shared at all"),
        (4, "tiny doc"),          # shorter than window: untouched
        (5, ""),                  # empty: 0 tokens, '' out
        (6, None),                # NULL: NULL out
        (7, boiler),              # entirely one duplicated window -> ''
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_tokens, r.kept_tokens, r.clean_text)
        for r in substring_dedup_clean(df, window=4).collect()
    }
    assert out[1] == (8, 4, "unique one text here")
    assert out[2] == (8, 4, "other tail words two")   # original case kept
    assert out[3] == (7, 7, "totally distinct content nothing shared at all")
    assert out[4] == (2, 2, "tiny doc")
    assert out[5] == (0, 0, "")
    assert out[6] == (None, None, None)
    assert out[7] == (4, 0, "")
    with _pytest.raises(ValueError):
        substring_dedup_clean(df, window=64)


def test_substring_clean_consistent_with_stats(spark):
    """Cross-operator invariant: on the same corpus and window, the stats
    half's dup_tokens must equal n_tokens - kept_tokens of the removal
    half for every document (seeded corpus with shared templates so both
    zero- and high-duplication docs appear)."""
    import random

    from grandine_spark.operators.dedup import (
        substring_dedup_clean,
        substring_dup_stats,
    )

    rng = random.Random(31337)
    templates = [
        "the quick brown fox jumps over the lazy dog every day",
        "pack my box with five dozen liquor jugs tonight",
    ]
    rows = []
    for i in range(120):
        parts = []
        if rng.random() < 0.6:
            parts.append(rng.choice(templates))
        parts.append(" ".join(f"u{i}w{j}" for j in range(rng.randint(0, 12))))
        if rng.random() < 0.3:
            parts.append(rng.choice(templates))
        rows.append((i, " ".join(p for p in parts if p).strip()))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {
        r.doc_id: (r.n_tokens, r.dup_tokens)
        for r in substring_dup_stats(df, window=4).collect()
    }
    clean = {
        r.doc_id: (r.n_tokens, r.kept_tokens)
        for r in substring_dedup_clean(df, window=4).collect()
    }
    assert set(stats) == set(clean)
    for d in stats:
        sn, dup = stats[d]
        cn, kept = clean[d]
        assert sn == cn, (d, sn, cn)
        assert dup == cn - kept, (d, dup, cn, kept)
