"""Connected components, as-of join, and deterministic sampling operators."""

import hashlib

import pytest
from pyspark.sql import functions as F

from grandine_spark.operators.graph import connected_components, dedup_clusters
from grandine_spark.operators.sampling import hash_sample, quota_sample
from grandine_spark.operators.temporal import asof_join

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _cc(spark, pairs):
    rows = connected_components(_edges(spark, pairs)).collect()
    return {r.node: r.component for r in rows}


def test_cc_path_graph(spark):
    # a single 12-node path: worst case for plain propagation; pointer
    # jumping must still converge well under max_iter
    comp = _cc(spark, [(i, i + 1) for i in range(11)])
    assert comp == {i: 0 for i in range(12)}


def test_cc_two_components_and_orientation_invariance(spark):
    comp = _cc(spark, [(3, 1), (1, 2), (10, 11), (11, 10), (12, 11)])
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_cc_star_and_cycle(spark):
    star = [(100, v) for v in range(101, 110)]
    cycle = [(0, 1), (1, 2), (2, 3), (3, 0)]
    comp = _cc(spark, star + cycle)
    assert all(comp[v] == 100 for v in range(100, 110))
    assert all(comp[v] == 0 for v in range(4))


def test_cc_bridge_merges_chains(spark):
    # two 5-chains joined by one bridge edge → a single component
    chains = [(i, i + 1) for i in range(4)] + [(i, i + 1) for i in range(10, 14)]
    comp = _cc(spark, chains + [(4, 10)])
    assert set(comp.values()) == {0}


def test_dedup_clusters_assigns_singletons(spark, docs):
    pairs = _edges(spark, [(1, 2), (2, 3), (7, 9)])
    clusters = dedup_clusters(docs, pairs)
    got = {r.doc_id: (r.cluster_id, r.is_keeper) for r in clusters.collect()}
    assert got[1] == (1, True) and got[2] == (1, False) and got[3] == (1, False)
    assert got[7] == (7, True) and got[9] == (7, False)
    # untouched docs are their own keeper
    assert got[42] == (42, True)
    assert len(got) == docs.count()


def test_dedup_clusters_closes_minhash_pairs(spark, docs):
    """Transitive closure over real near-dup pairs: every pair's two sides
    land in the same cluster, and the keeper is the cluster minimum."""
    from grandine_spark.operators.dedup import minhash_lsh_pairs

    dup = docs.select("doc_id", (F.col("doc_id") % 20).alias("src")).join(
        docs.select(F.col("doc_id").alias("src"), "text"), "src"
    )
    pairs = minhash_lsh_pairs(dup, n_perm=4, band_size=2, shingle_k=3)
    clusters = dedup_clusters(dup, pairs)
    comp = {r.doc_id: r.cluster_id for r in clusters.collect()}
    for r in pairs.collect():
        assert comp[r.id_a] == comp[r.id_b]
    keepers = {r.cluster_id for r in clusters.filter("is_keeper").collect()}
    assert keepers == set(comp.values())


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_strict(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:05:00")), (2, 10, _ts("2024-01-01 00:02:00"))],
        "eid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 00:02:00"), "a"),
            (101, 10, _ts("2024-01-01 00:04:00"), "b"),
            (102, 99, _ts("2024-01-01 00:00:00"), "z"),
        ],
        "rid long, k long, rts timestamp, tag string",
    )
    incl = asof_join(left, right, "k", "ts", "rts", ["rid", "tag"], right_seq="rid")
    got = {r.eid: (r.rid, r.tag) for r in incl.collect()}
    # eid 1 at :05 → rid 101 (:04); eid 2 at :02 → rid 100 (equal ts, inclusive)
    assert got == {1: (101, "b"), 2: (100, "a")}

    strict = asof_join(
        left, right, "k", "ts", "rts", ["rid"], right_seq="rid", strict=True
    )
    got = {r.eid: r.rid for r in strict.collect()}
    # strict: the equal-ts right row no longer matches eid 2
    assert got == {1: 101, 2: None}


def test_asof_tie_break_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01 01:00:00")), (2, 6, _ts("2024-01-01 01:00:00"))],
        "eid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (7, 5, _ts("2024-01-01 00:30:00"), "lo"),
            (9, 5, _ts("2024-01-01 00:30:00"), "hi"),
        ],
        "rid long, k long, rts timestamp, tag string",
    )
    out = asof_join(left, right, "k", "ts", "rts", ["rid", "tag"], right_seq="rid")
    got = {r.eid: (r.rid, r.tag) for r in out.collect()}
    # equal right timestamps: greatest rid wins; key 6 has no right rows
    assert got == {1: (9, "hi"), 2: (None, None)}


def test_asof_left_columns_survive(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01 01:00:00"), 3.5)],
        "eid long, k long, ts timestamp, v double",
    )
    right = spark.createDataFrame(
        [(7, 5, _ts("2024-01-01 00:30:00"))], "rid long, k long, rts timestamp"
    )
    row = asof_join(left, right, "k", "ts", "rts", ["rid"]).collect()[0]
    assert (row.eid, row.k, row.v, row.rid) == (1, 5, 3.5, 7)


def test_hash_sample_deterministic_and_partition_invariant(spark, docs):
    a = {r.doc_id for r in hash_sample(docs, 0.3).collect()}
    b = {r.doc_id for r in hash_sample(docs.repartition(13), 0.3).collect()}
    assert a == b and a
    # matches the documented md5-prefix rule exactly
    for did in list(a)[:20]:
        h = int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16)
        assert h / float(1 << 60) < 0.3
    # monotone in rate: a smaller rate yields a subset
    assert {r.doc_id for r in hash_sample(docs, 0.1).collect()} <= a


def test_quota_sample_per_stratum(spark, docs):
    out = quota_sample(docs.select("doc_id", "lang"), "lang", 7).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append((r.sample_rank, r.doc_id))
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert set(by_lang) == langs
    for lang, rows in by_lang.items():
        ranks = sorted(r for r, _ in rows)
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 7
        # rank order IS md5 order
        ordered = sorted(rows, key=lambda t: (hashlib.md5(str(t[1]).encode()).hexdigest(), t[1]))
        assert [t[0] for t in ordered] == ranks


def test_quota_sample_stable_under_repartition(spark, docs):
    d = docs.select("doc_id", "lang")
    a = sorted((r.lang, r.doc_id) for r in quota_sample(d, "lang", 5).collect())
    b = sorted(
        (r.lang, r.doc_id) for r in quota_sample(d.repartition(17), "lang", 5).collect()
    )
    assert a == b


def test_line_dedup_removes_boilerplate(spark):
    d = spark.createDataFrame(
        [
            (1, "alpha\nshared footer\nbody one"),
            (2, "beta\nshared footer\nbody two"),
            (3, "shared footer"),
        ],
        "doc_id long, text string",
    )
    from grandine_spark.operators.dedup import line_dedup

    out = {r.doc_id: r for r in line_dedup(d).collect()}
    assert out[1].text == "alpha\nshared footer\nbody one"
    assert out[2].text == "beta\nbody two"  # footer removed, order kept
    assert out[3].text == "" and out[3].n_lines_kept == 0
    assert (out[1].n_lines_total, out[2].n_lines_total) == (3, 3)


def test_line_dedup_min_chars_keeps_blanks(spark):
    d = spark.createDataFrame(
        [(1, "x\n\ny"), (2, "z\n\nw")], "doc_id long, text string"
    )
    from grandine_spark.operators.dedup import line_dedup

    out = {r.doc_id: r.text for r in line_dedup(d, min_chars=1).collect()}
    # the empty separator line survives in BOTH docs
    assert out == {1: "x\n\ny", 2: "z\n\nw"}


def test_line_dedup_first_occurrence_is_positional(spark):
    # within one doc a repeated line keeps only its first instance
    d = spark.createDataFrame([(5, "a\nb\na\nc")], "doc_id long, text string")
    from grandine_spark.operators.dedup import line_dedup

    row = line_dedup(d).collect()[0]
    assert row.text == "a\nb\nc" and row.n_lines_kept == 3 and row.n_lines_total == 4


def test_redact_pii_matches_python_expectation(spark):
    from grandine_spark.functions.text import redact_pii

    d = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@sub.example.org now"),
            (2, "server at 192.168.001.7 port"),
            (3, "call +44 207 946 0958 today"),
            (4, "nothing here 3.14 or v1.2.3 stays"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.red for r in d.select("doc_id", redact_pii(F.col("text")).alias("red")).collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "server at <IP> port"
    assert got[3] == "call <PHONE> today"
    assert got[4] == "nothing here 3.14 or v1.2.3 stays"


def test_redact_pii_sql_twin_agrees(spark):
    """The DuckDB chain built by pii_redaction_sql produces byte-identical
    output to the Spark chain on hostile mixed text."""
    import duckdb

    from grandine_spark.functions.text import pii_redaction_sql, redact_pii

    texts = [
        "a@b.co and c.d-e_f@g-h.io, ip 1.2.3.4 tel +1 555 0100",
        "no pii at all",
        "edge 999.999.999.999 and x@y.z stays (z too short? no: 1-char tld)",
        "+352 123 456 7890 multi",
    ]
    d = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    spark_out = {
        r.i: r.red for r in d.select("i", redact_pii(F.col("t")).alias("red")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        sql = pii_redaction_sql("?")
        duck = con.execute(f"SELECT {sql}", [t]).fetchone()[0]
        assert spark_out[i] == duck, (i, spark_out[i], duck)


def test_track_stats_matches_python(spark):
    import datetime
    import math

    from grandine_spark.operators.tracks import track_stats

    def hav(lon1, lat1, lon2, lat2):
        rl1, rl2 = math.radians(lat1), math.radians(lat2)
        a = math.sin((rl2 - rl1) / 2) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(
            (math.radians(lon2) - math.radians(lon1)) / 2
        ) ** 2
        return 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a)) * 6371000.0

    t0 = datetime.datetime(2024, 1, 1)
    # user 1: three points out of time order in the input; user 2: single point
    rows = [
        (1, t0 + datetime.timedelta(minutes=2), 2, 10.0, 0.0),
        (1, t0, 0, 0.0, 0.0),
        (1, t0 + datetime.timedelta(minutes=1), 1, 5.0, 5.0),
        (2, t0, 3, 100.0, 50.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, lon double, lat double"
    )
    got = {r.user_id: r for r in track_stats(ev, seq_col="event_id").collect()}
    want = hav(0, 0, 5, 5) + hav(5, 5, 10, 0)  # time order, not input order
    assert got[1].n_points == 3 and abs(got[1].length_m - want) < 0.01
    assert got[2].n_points == 1 and got[2].length_m == 0.0
    assert got[1].start_ts == t0 and got[1].end_ts == t0 + datetime.timedelta(minutes=2)


def test_focal_mean_wrap_and_clamp(spark):
    from grandine_spark.operators.raster import focal_mean

    # z1 grid is 2x2: x wraps mod 2, y clamps to [0,2)
    r = spark.createDataFrame(
        [(0, 0, 10.0), (1, 1, 30.0)], "tile_x long, tile_y long, n double"
    )
    out = {(r2.tile_x, r2.tile_y): (r2.focal_mean, r2.n_neighbors) for r2 in focal_mean(r, 1).collect()}
    # every cell of the 2x2 grid receives both sources: with radius 1 on a
    # width-2 wrap both dx=-1 and dx=+1 land on the other column and dx=0 on
    # its own, so each receiver sees each source once or twice
    assert set(out) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    for k, (m, n) in out.items():
        assert 10.0 <= m <= 30.0 and n >= 2


def test_focal_mean_isolated_cell(spark):
    from grandine_spark.operators.raster import focal_mean

    r = spark.createDataFrame([(5, 5, 8.0)], "tile_x long, tile_y long, n double")
    out = {(x.tile_x, x.tile_y): (x.focal_mean, x.n_neighbors) for x in focal_mean(r, 4).collect()}
    # a lone cell dilates to its 3x3 neighborhood, each with mean = its value
    assert len(out) == 9
    assert all(v == (8.0, 1) for v in out.values())
    assert (5, 5) in out and (4, 4) in out and (6, 6) in out


def test_zonal_stats_matches_manual(spark):
    from grandine_spark.operators.spatial_join import zonal_stats
    from grandine_spark.sources import synth

    feats = synth.features(spark, n_polygons=10, n_roads=0, n_pois=0)
    # points at polygon centroids carry value = their index
    cents = feats.selectExpr(
        "feature_id", "(minx + maxx) / 2 AS lon", "(miny + maxy) / 2 AS lat"
    )
    pts = cents.select(
        F.col("feature_id").cast("string").alias("pid"), "lon", "lat",
        (F.col("feature_id") * 10).cast("double").alias("val"),
    )
    out = {r.feature_id: r for r in zonal_stats(
        pts, feats, value_col="val", zoom=6, point_id="pid"
    ).collect()}
    for fid, r in out.items():
        assert r.n_points >= 1
        # the centroid point of polygon fid is inside it with value fid*10
        assert r.min_value <= fid * 10 <= r.max_value


def test_vocab_topk_rank_and_counts(spark):
    from grandine_spark.functions.text import vocab_topk

    d = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b b"), (3, "c")], "doc_id long, text string"
    )
    rows = {r.token: r for r in vocab_topk(d, k=10).collect()}
    assert rows["a"].term_count == 3 and rows["a"].doc_freq == 2
    assert rows["b"].term_count == 3 and rows["b"].doc_freq == 2
    assert rows["c"].term_count == 2 and rows["c"].doc_freq == 2
    # ties broken by token asc: a before b
    assert rows["a"].rank == 1 and rows["b"].rank == 2 and rows["c"].rank == 3


def test_cell_pyramid_levels_consistent(spark):
    """Each zoom's counts must equal the explicit downsample chain, and the
    total per level equals the point count."""
    from grandine_spark.operators.raster import cell_pyramid, downsample, rasterize_points

    pts = spark.createDataFrame(
        [(float(i * 37 % 360 - 180) + 0.5, float(i * 17 % 160 - 80) + 0.5)
         for i in range(200)],
        "lon double, lat double",
    )
    pyr = cell_pyramid(pts, max_zoom=5, min_zoom=2)
    by_z = {}
    for r in pyr.collect():
        by_z.setdefault(r.tile_z, {})[(r.tile_x, r.tile_y)] = r.n
    assert set(by_z) == {2, 3, 4, 5}
    for z in by_z:
        assert sum(by_z[z].values()) == 200
    # z4 from the pyramid == downsample(rasterize(z5) -> z4)
    want = {
        (r.tile_x, r.tile_y): r.n
        for r in downsample(rasterize_points(pts, 5), 5, 4).collect()
    }
    assert by_z[4] == want


def test_weighted_hash_sample_is_per_stratum_hash_sample(spark, docs):
    from grandine_spark.operators.sampling import hash_sample, weighted_hash_sample

    out = weighted_hash_sample(docs, {"en": 0.4, "de": 0.2}, strata_col="lang")
    got = {(r.doc_id) for r in out.select("doc_id").collect()}
    en = {r.doc_id for r in hash_sample(docs.filter("lang = 'en'"), 0.4).collect()}
    de = {r.doc_id for r in hash_sample(docs.filter("lang = 'de'"), 0.2).collect()}
    assert got == en | de  # other langs default to rate 0


def test_tfidf_top_terms(spark):
    import math

    from grandine_spark.functions.text import tfidf_top_terms

    d = spark.createDataFrame(
        [(1, "rare common common"), (2, "common common"), (3, "common other")],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.token): (r.tfidf, r.rank) for r in tfidf_top_terms(d, m=2).collect()}
    idf = lambda df: math.log(4.0 / (df + 1)) + 1.0
    # doc 1: common has tf=2 → 2*(ln(4/4)+1) = 2.0, beating rare's
    # 1*(ln(4/2)+1) ≈ 1.693; in doc 3 (both tf=1) the rare token wins
    assert abs(out[(1, "rare")][0] - round(idf(1), 6)) < 1e-9
    assert abs(out[(1, "common")][0] - round(2 * idf(3), 6)) < 1e-9
    assert out[(1, "common")][1] == 1 and out[(1, "rare")][1] == 2
    assert out[(3, "other")][1] == 1  # rare beats the ubiquitous token


def test_asof_null_keys_and_null_ts_never_match(spark):
    """SQL join semantics: NULL keys never compare equal (DuckDB's ASOF JOIN
    leaves NULL-key left rows unmatched), and a right row with NULL rts
    precedes nothing. Regression: partitionBy co-grouped the NULL keys so
    NULL-key rows matched each other."""
    from grandine_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [
            (1, None, _ts("2024-01-01 00:05:00")),
            (2, 10, _ts("2024-01-01 00:05:00")),
            (3, 10, None),
        ],
        "eid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, None, _ts("2024-01-01 00:03:00"), "nullkey"),
            (101, 10, _ts("2024-01-01 00:02:00"), "ok"),
            (102, 10, None, "nullts"),
        ],
        "rid long, k long, rts timestamp, tag string",
    )
    out = asof_join(left, right, "k", "ts", "rts", ["rid", "tag"], right_seq="rid")
    got = {r.eid: (r.rid, r.tag) for r in out.collect()}
    # NULL-key left row: unmatched; NULL-ts left row: nothing precedes it;
    # the valid pair matches the non-NULL-ts right row only
    assert got == {1: (None, None), 2: (101, "ok"), 3: (None, None)}


def test_pagerank_mass_and_structure(spark):
    """Ranks stay a probability distribution (dangling mass recycled);
    a sink hub out-ranks its spokes; a known 2-node exchange matches the
    closed form."""
    from pyspark.sql import functions as F

    from grandine_spark.operators.graph import pagerank

    # star: 0..4 all link to 5; 5 links nowhere (dangling hub)
    nodes = spark.createDataFrame([(i,) for i in range(6)], "node long")
    edges = spark.createDataFrame([(i, 5) for i in range(5)], "src long, dst long")
    pr = {r.node: r.rank for r in pagerank(nodes, edges, n_iter=30).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-9  # mass conserved
    assert all(pr[5] > pr[i] for i in range(5))
    assert len({round(pr[i], 12) for i in range(5)}) == 1  # spokes symmetric

    # 2-cycle: closed form rank = 0.5 each, any damping
    n2 = spark.createDataFrame([(0,), (1,)], "node long")
    e2 = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    pr2 = {r.node: r.rank for r in pagerank(n2, e2, n_iter=15).collect()}
    assert abs(pr2[0] - 0.5) < 1e-12 and abs(pr2[1] - 0.5) < 1e-12

    # duplicate edges and self-loops don't change the result
    e_dirty = e2.unionByName(
        spark.createDataFrame([(0, 1), (0, 0), (1, 1)], "src long, dst long")
    )
    pr3 = {r.node: r.rank for r in pagerank(n2, e_dirty, n_iter=15).collect()}
    assert pr3 == pr2

    # edges into UNCRAWLED nodes (dst outside the node table) are dropped
    # — the induced-subgraph rule — so mass still sums to 1 instead of
    # leaking out through the absent node every iteration
    e_leaky = e2.unionByName(
        spark.createDataFrame([(0, 99), (1, 98)], "src long, dst long")
    )
    pr4 = {r.node: r.rank for r in pagerank(n2, e_leaky, n_iter=15).collect()}
    assert abs(sum(pr4.values()) - 1.0) < 1e-9
    assert set(pr4) == {0, 1}


def test_cc_seeded_differ_vs_union_find(spark):
    """Seeded adversarial differ: random graphs (sparse, dense, many
    singleton-ish edges, long chains mixed with hubs) vs a pure-python
    union-find. Any propagation/pointer-jumping bug that mislabels one
    node breaks the exact dict equality."""
    import random

    def union_find(pairs):
        parent = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in parent}

    for seed, n_nodes, n_edges in [(1, 30, 15), (2, 40, 80), (3, 200, 120), (4, 60, 59)]:
        rng = random.Random(seed)
        pairs = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ]
        pairs = [(a, b) for a, b in pairs if a != b] or [(0, 1)]
        # seed 4: force a worst-case long chain through the random edges
        if seed == 4:
            pairs += [(1000 + i, 1000 + i + 1) for i in range(30)]
        assert _cc(spark, pairs) == union_find(pairs)


def test_keep_best_duplicates_quality_keeper(spark):
    from grandine_spark.operators.graph import keep_best_duplicates

    docs = spark.createDataFrame(
        [
            (1, 10, "short"),
            (2, 99, "the long one"),  # best of cluster {1,2,3}
            (3, 99, "tie loses to min id 2"),  # same score, higher id
            (7, 5, "singleton stays"),
            (8, 1, "pair a"),
            (9, 2, "pair b best"),
        ],
        "doc_id long, quality long, text string",
    )
    pairs = _edges(spark, [(1, 2), (2, 3), (8, 9)])
    kept = {
        r.doc_id: (r.cluster_id, r.quality)
        for r in keep_best_duplicates(docs, pairs, score="quality").collect()
    }
    # cluster {1,2,3}: 2 and 3 tie on 99 -> min id 2 wins; {8,9}: 9 wins
    assert kept == {2: (1, 99), 7: (7, 5), 9: (8, 2)}
    # original columns survive the filter
    row = keep_best_duplicates(docs, pairs, score="quality").filter(
        F.col("doc_id") == 2
    ).collect()[0]
    assert row.text == "the long one"


def test_hash_sample_nests_not_multiplies(spark):
    """Hash samples on the same id NEST: sampling an 0.15 sample at 1/3
    keeps everything (min of rates), and a smaller-rate sample is always a
    subset of a larger one — the progressive-sampling property the
    docstring promises."""
    from grandine_spark.operators.sampling import hash_sample

    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    s15 = hash_sample(df, 0.15)
    nested = hash_sample(s15, 1.0 / 3.0)
    assert nested.count() == s15.count()
    s05 = hash_sample(df, 0.05)
    ids15 = {r.doc_id for r in s15.collect()}
    assert {r.doc_id for r in s05.collect()} <= ids15
