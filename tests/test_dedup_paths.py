"""Arrow (pandas UDF) and JVM (column expression) dedup paths must produce
identical arrays — the Arrow path exists purely because Catalyst's
interpreted higher-order functions are ~6x slower, never to change
semantics."""

from __future__ import annotations

from kafka_clickhouse_example_spark.operators import dedup as D
from kafka_clickhouse_example_spark.sources.catalog import load_table


def test_shingles_arrow_equals_jvm(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    arrow = {
        (r["doc_id"], tuple(r["sh"]))
        for r in D.with_shingles(docs, use_arrow=True).collect()
    }
    jvm = {
        (r["doc_id"], tuple(r["sh"]))
        for r in D.with_shingles(docs, use_arrow=False).collect()
    }
    assert arrow == jvm


def test_minhash_arrow_equals_jvm(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sh = D.with_shingles(docs)
    arrow = {
        (r["doc_id"], tuple(r["mh"]))
        for r in D.with_minhash_signature(sh, use_arrow=True).collect()
    }
    jvm = {
        (r["doc_id"], tuple(r["mh"]))
        for r in D.with_minhash_signature(sh, use_arrow=False).collect()
    }
    assert arrow == jvm


def test_shingles_arrow_equals_jvm_on_hostile_whitespace(spark):
    """ADVICE r1: tab/newline-padded and unicode-whitespace text must
    tokenize identically on the Arrow and column paths (Spark trim() strips
    ASCII spaces only; Java \\s is the ASCII class; split keeps boundary
    empty tokens). NBSP/CJK spaces are NOT separators on either path."""
    rows = [
        (1, "aa bb cc dd"),
        (2, "\taa bb cc dd\n"),        # leading/trailing ASCII whitespace
        (3, "  aa bb cc dd  "),         # space padding (trimmed)
        (4, "aa bb cc dd ee"),     # NBSP inside a token
        (5, "aa　bb cc dd ee"),     # CJK space inside a token
        (6, "aa\nbb\tcc\rdd"),          # mixed ASCII separators
        (7, ""),
        (8, "   "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    arrow = {
        (r["doc_id"], tuple(r["sh"]))
        for r in D.with_shingles(docs, use_arrow=True).collect()
    }
    jvm = {
        (r["doc_id"], tuple(r["sh"]))
        for r in D.with_shingles(docs, use_arrow=False).collect()
    }
    assert arrow == jvm


def test_compression_ratio_matches_zlib(spark, sf_dir):
    """text_compression_ratio ≡ direct CPython zlib at level 6, every row."""
    import zlib

    from kafka_clickhouse_example_spark.registry import all_queries
    from kafka_clickhouse_example_spark.sources.catalog import load_compute_table

    got = {
        r.doc_id: (r.n_chars, r.compressed_len)
        for r in all_queries()["text_compression_ratio"](spark, sf_dir).collect()
    }
    docs = load_compute_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    want = {
        r.doc_id: (len(r.text), len(zlib.compress(r.text.encode("utf-8"), 6)))
        for r in docs
    }
    assert got == want and len(got) > 0


def test_banding_threshold_curve():
    """Pin the analytic LSH S-curves of the two documented profiles
    (VERDICT r2 #3). Production (64 perms, 16 bands x 4 rows) must be
    near-total at the j>=0.8 near-dup zone AND strictly sharper below the
    ~0.5 threshold than the fixture profile (8 perms, 4 bands x 2 rows) —
    the sharper low-j rejection is what bounds exact-verify work at scale.
    """
    fb = D.MINHASH_PERMS // D.LSH_BAND_ROWS          # 4 bands
    pb = D.PRODUCTION_MINHASH_PERMS // D.PRODUCTION_LSH_BAND_ROWS  # 16

    # Near-dup zone: production catches essentially every true pair.
    for j in (0.8, 0.85, 0.9, 0.95):
        assert D.candidate_probability(j, D.PRODUCTION_LSH_BAND_ROWS, pb) >= 0.999
        assert D.candidate_probability(j, D.LSH_BAND_ROWS, fb) >= 0.98

    # Noise zone: production admits strictly fewer false candidates.
    for j in (0.05, 0.1, 0.2, 0.3):
        prod = D.candidate_probability(j, D.PRODUCTION_LSH_BAND_ROWS, pb)
        fix = D.candidate_probability(j, D.LSH_BAND_ROWS, fb)
        assert prod < fix, f"production curve not sharper at j={j}"
    assert D.candidate_probability(0.2, D.PRODUCTION_LSH_BAND_ROWS, pb) < 0.03

    # Both curves are monotone in j (sanity on the formula).
    grid = [i / 20 for i in range(21)]
    for r, b in ((D.LSH_BAND_ROWS, fb), (D.PRODUCTION_LSH_BAND_ROWS, pb)):
        ps = [D.candidate_probability(j, r, b) for j in grid]
        assert ps == sorted(ps)


def test_production_profile_candidate_recall(spark, sf_dir):
    """Empirical end-to-end check of the production profile on the fixture
    corpus: with exact verify downstream, every pair LSH finds is a true
    pair (precision 1 by construction), and candidate recall vs the exact
    inverted-index ground truth must clear the analytic floor."""
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        (r.id1, r.id2) for r in D.jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert truth, "fixture corpus must contain >=1 true near-dup pair"
    got = {
        (r.id1, r.id2)
        for r in D.minhash_lsh_pairs(
            docs,
            threshold=0.8,
            num_perms=D.PRODUCTION_MINHASH_PERMS,
            band_rows=D.PRODUCTION_LSH_BAND_ROWS,
        ).collect()
    }
    assert got <= truth, "exact verify must keep precision at 1.0"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.95, f"production-profile recall {recall:.2f} below floor"


def test_simhash_arrow_path_equals_column_path(spark, sf_dir):
    """The Arrow numpy simhash must be BIT-IDENTICAL to the column-fold
    plan at both the 16-bit default and the 32-bit pair width (the Arrow
    path is what keeps dedup_simhash_* oracle-green)."""
    from kafka_clickhouse_example_spark.operators import dedup as D
    from kafka_clickhouse_example_spark.sources.catalog import load_compute_table

    docs = load_compute_table(spark, sf_dir, "documents")
    for bits in (16, 32):
        fast = {
            (r["doc_id"], r["sh"])
            for r in D.with_simhash(docs, out="sh", bits=bits, use_arrow=True)
            .select("doc_id", "sh")
            .collect()
        }
        ref = {
            (r["doc_id"], r["sh"])
            for r in D.with_simhash(docs, out="sh", bits=bits, use_arrow=False)
            .select("doc_id", "sh")
            .collect()
        }
        assert fast == ref and len(fast) > 0


def test_containment_catches_what_jaccard_misses(spark):
    """A short doc quoted verbatim inside a much longer one: containment ~1
    (detected) while Jaccard ~ |small|/|big| (missed at any useful
    threshold) — the operator's reason to exist. Directionality: the
    smaller shingle set must come out as contained_id."""
    from kafka_clickhouse_example_spark.operators import dedup as D

    quote = " ".join(f"tok{i}" for i in range(10))
    filler = " ".join(f"pad{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote + " " + filler.replace("pad", "tail"))],
        "doc_id long, text string",
    )
    got = D.containment_pairs(df, 0.9).collect()
    assert len(got) == 1
    row = got[0]
    assert (row.contained_id, row.container_id) == (1, 2)
    assert row.containment >= 0.9
    assert row.n_sh_contained < row.n_sh_container
    assert D.jaccard_pairs(df, 0.5).count() == 0


def test_containment_tie_breaks_by_doc_id(spark):
    """Equal-size shingle sets (identical texts): the lower doc_id is the
    contained side — the rule must be total so output is deterministic."""
    from kafka_clickhouse_example_spark.operators import dedup as D

    text = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [(7, text), (3, text)], "doc_id long, text string"
    )
    got = D.containment_pairs(df, 0.9).collect()
    assert len(got) == 1
    assert (got[0].contained_id, got[0].container_id) == (3, 7)
    assert got[0].containment == 1.0


def test_reach3_null_text_matches_oracle(spark):
    """NULL-text docs must form NO duplicate group: the oracle's spokes
    join (g.h = c.h) never matches a NULL hash, while the Spark window
    over md5(text) would lump every NULL hash into ONE partition and
    emit a phantom group (review finding). End-to-end parity on a corpus
    with two NULL-text docs: the registered query vs DuckDB running the
    registered oracle."""
    import tempfile

    import duckdb

    from kafka_clickhouse_example_spark.plans.queries_dedup import (
        _REACH3_ORACLE,
        dedup_reach3_sql_recursive,
    )

    rows = [(1, "dup a"), (2, "dup a"), (3, None), (4, None), (5, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
        got = sorted(
            (r.canonical_id, r.n_reachable)
            for r in dedup_reach3_sql_recursive(spark, d).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{d}/documents.parquet/*.parquet')"
        )
        want = sorted(tuple(r) for r in con.execute(_REACH3_ORACLE).fetchall())
        con.close()
    assert got == want == [(1, 1)]


def test_reach3_star_edges_linear_in_group_size(spark):
    """The recursive-CTE demo's edge relation is canonical-star: a
    duplicate group of size g contributes 2*(g-1) edges (doc <-> group
    min, both directions), NOT g*(g-1) all-pairs — the round-4 `weak`.
    One g=1000 group + 3 singletons: 1998 edges, and the traversal still
    reports the full clique reachability (n_reachable = g-1)."""
    from kafka_clickhouse_example_spark.plans.queries_dedup import (
        _REACH3_ORACLE,
        _REACH3_TRAVERSAL_SQL,
    )

    g = 1000
    rows = [(i, "dup boilerplate") for i in range(g)]
    rows += [(g + i, f"unique text {i}") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("reach3_linear_docs")

    # The oracle text IS the full derivation (grp/canon/spokes + traversal)
    # in portable SQL — run it on Spark against the synthetic table. Both
    # engines execute this identically, so asserting on it covers the
    # materialized Spark path's spokes definition too (same expressions).
    sql = _REACH3_ORACLE.replace("FROM documents", "FROM reach3_linear_docs")
    # count the edge relation itself: everything up to `seeds` defines it
    edges_cte = sql[: sql.index(",\nseeds AS")]
    n_edges = spark.sql(edges_cte + "\nSELECT count(*) AS n FROM edges").collect()[0].n
    assert n_edges == 2 * (g - 1)  # linear, not 999000 all-pairs

    out = {r.canonical_id: r.n_reachable for r in spark.sql(sql).collect()}
    assert out == {0: g - 1}  # same answer the clique edge set gave

    # And the Spark-side materialized traversal gives the same answer when
    # fed the window-derived spokes relation the registered query builds.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("h")
    spokes = (
        df.select("doc_id", F.md5("text").alias("h"))
        .withColumn("canonical", F.min("doc_id").over(w))
        .withColumn("gsize", F.count(F.lit(1)).over(w))
        .filter((F.col("gsize") > 1) & (F.col("doc_id") != F.col("canonical")))
        .select("canonical", F.col("doc_id").alias("member"))
    )
    spokes.createOrReplaceTempView("reach3_linear_spokes")
    assert spokes.count() == g - 1
    out2 = {
        r.canonical_id: r.n_reachable
        for r in spark.sql(
            _REACH3_TRAVERSAL_SQL.format(spokes="reach3_linear_spokes")
        ).collect()
    }
    assert out2 == {0: g - 1}


def test_null_text_agrees_across_paths_and_never_aborts(spark):
    """One NULL document must not abort the job (the round-5 BPE NULL-text
    crash class, found again in the dedup kernels while building the
    served gate), and the Arrow kernels must propagate NULL exactly like
    the column expressions: NULL text -> NULL shingle array -> NULL
    signature, dropped by drop_empty / emitting no rows under explode."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, None), (3, "x y")],
        "doc_id long, text string",
    )
    # drop_empty=True: NULL-text and too-short docs vanish on both paths
    for arrow in (True, False):
        rows = D.with_shingles(docs, use_arrow=arrow).collect()
        assert sorted(r.doc_id for r in rows) == [1], arrow
    # drop_empty=False: the NULL-text row survives with an EMPTY shingle
    # array on both paths (the column path's shingle builder collapses the
    # NULL token array to []), and the downstream minhash kernel agrees
    # across paths instead of crashing
    shs, mhs = [], []
    for arrow in (True, False):
        sh = D.with_shingles(docs, use_arrow=arrow, drop_empty=False)
        got = {r.doc_id: r.sh for r in sh.collect()}
        assert got[2] == [], arrow
        shs.append(got)
        mhs.append(
            {
                r.doc_id: r.mh
                for r in D.with_minhash_signature(sh, use_arrow=arrow).collect()
            }
        )
    assert shs[0] == shs[1]
    assert mhs[0] == mhs[1]


def test_incremental_minhash_strategy_parity(spark, sf_dir):
    """The broadcast and shuffle strategies of incremental_minhash_pairs
    are PHYSICAL variants of one logical plan (round 9: the broadcast
    shape hits Spark's hard 8 GiB cap when the "new" side is
    corpus-proportional — the sf10 split-leakage audit). Emitted pairs
    must be identical, and the shapes must actually differ: broadcast
    plans a BroadcastHashJoin, shuffle must not broadcast the new side."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)

    def rows(strategy):
        return sorted(
            (r["new_id"], r["corpus_id"], r["n_common"], round(r["jaccard"], 9))
            for r in D.incremental_minhash_pairs(
                new, corpus, 0.3, strategy=strategy
            ).collect()
        )

    bcast, shuf = rows("broadcast"), rows("shuffle")
    assert bcast == shuf and bcast  # identical AND non-empty on this corpus

    bcast_plan = D.incremental_minhash_pairs(
        new, corpus, 0.3, strategy="broadcast"
    )._jdf.queryExecution().executedPlan().toString()
    shuf_plan = D.incremental_minhash_pairs(
        new, corpus, 0.3, strategy="shuffle"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bcast_plan
    assert "BroadcastHashJoin" not in shuf_plan
    assert "SortMergeJoin" in shuf_plan

    import pytest

    with pytest.raises(ValueError, match="unknown strategy"):
        D.incremental_minhash_pairs(new, corpus, 0.3, strategy="sort")


def test_broadcast_strategy_raises_on_corpus_proportional_new_side(spark):
    """Round-9 verdict ask #4: the broadcast-ceiling class of bug must be
    impossible to reintroduce. The audit's shape — a "new" side that
    grows with the corpus (10%+ row ratio) past the guard floor — must
    raise up front under strategy="broadcast" with a message pointing at
    the shuffle knob, not die at Spark's 8 GiB broadcast cap mid-job.
    Shingle relations are supplied directly so the guard is exercised on
    exactly the relations the joins would broadcast."""
    import pytest
    from pyspark.sql import functions as F

    def shingles(n, offset=0):
        # (doc_id, sh): tiny fake shingle arrays. STRING elements so the
        # minhash kernel can run over this fixture when executed
        return spark.range(n).select(
            (F.col("id") + offset).alias("doc_id"),
            F.array(
                (F.col("id") % 97).cast("string"),
                ((F.col("id") + 1) % 97).cast("string"),
            ).alias("sh"),
        )

    floor = D.BROADCAST_GUARD_MIN_NEW_ROWS
    new = shingles(floor + 2_000)               # past the guard floor
    corpus = shingles(2 * floor, offset=10**6)  # ratio 0.6 >> 0.10
    with pytest.raises(ValueError, match="strategy='shuffle'"):
        D.incremental_minhash_pairs(
            None, None, 0.3, new_shingles=new, corpus_shingles=corpus
        )
    # the same shape under the knob the message points at is accepted
    # (plan construction succeeds; no guard, no counts)
    D.incremental_minhash_pairs(
        None, None, 0.3, new_shingles=new, corpus_shingles=corpus,
        strategy="shuffle",
    )
    # a bounded batch below the floor never pays the corpus ROW count and
    # never raises on ratio, whatever that ratio is
    D.incremental_minhash_pairs(
        None, None, 0.3, new_shingles=shingles(50),
        corpus_shingles=shingles(60, offset=10**6),
    )


def test_verify_joins_never_broadcast_corpus_sides(spark, sf_dir):
    """Round-10 probe finding: with the shingle memo materialized via
    localCheckpoint (the production shape — _shingled), Catalyst's
    LogicalRDD size estimate sits under the broadcast threshold and it
    statically planned BroadcastExchange on BOTH O(corpus) shingle sides
    of the minhash verify join — measured dying at
    spark.driver.maxResultSize (1028 MiB / 26 tasks) at 1.5M docs, while
    silently collecting ~350 MB per side at 500k docs. The corpus_side
    hint must keep every corpus-proportional relation (shingle arrays in
    minhash's verify, size relations in jaccard/containment's) out of
    broadcast in the pair emitters' plans — the deliberate tiny hot-list
    broadcast of the stop-cut is the one allowed exception."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # the hazard shape: memoized (localCheckpoint) shingles, like _shingled
    sh = D.with_shingles(docs).localCheckpoint(eager=True)

    emitters = {
        "minhash": D.minhash_lsh_pairs(None, 0.3, shingles=sh),
        "jaccard": D.jaccard_pairs(None, 0.3, shingles=sh),
        "containment": D.containment_pairs(None, 0.3, shingles=sh),
    }
    for name, df in emitters.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan, name
        assert "ShuffledHashJoin" in plan, name
    # minhash's exact verify joins the candidate pairs back to the
    # shingle arrays as SMJ (spill-safe — the shuffled-hash build form
    # died at 1.5M docs); jaccard/containment have NO verify join at all
    # (set sizes ride the inverted index through the aggregation), so a
    # SortMergeJoin appearing there means the join form crept back in.
    minhash_plan = emitters["minhash"]._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in minhash_plan
    for name in ("jaccard", "containment"):
        plan = emitters[name]._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan, name

    # stop-cut (r11 restructure): the hot-shingle cut is a window count
    # over the hashpartitioning(shingle) exchange the self-join needs
    # anyway — NO broadcast at all anymore (the pre-r11 hot-list
    # broadcast + anti-join needed an eager inverted-index checkpoint to
    # keep the kernel single-run; the window shape gets single-run via
    # ReuseExchange instead). Pin: zero broadcasts, the window cut
    # present, the SHJ pair join intact.
    stopcut = D.jaccard_pairs(None, 0.3, shingles=sh, max_shingle_freq=50)
    plan = stopcut._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan
    assert "Window" in plan, "stop-cut lost its window-based hot cut"
    assert "ShuffledHashJoin" in plan


def test_iterative_loops_never_broadcast_corpus_relations(spark, sf_dir):
    """Round-10: the CC label-propagation and PageRank round joins take
    corpus-proportional relations on BOTH sides (edges O(pairs), labels/
    ranks O(nodes)), and their materialized (LogicalRDD) inputs carry the
    size under-estimate that static-planned BroadcastHashJoin at test
    scale — fatal at a 10^9-node graph's 8 GiB broadcast cap. corpus_side
    pins every round join to SMJ; this asserts on the plans that ACTUALLY
    executed (SQL status store — the loops materialize each round, so the
    returned DataFrame's plan shows nothing)."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_example_spark.operators import graph as G

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = (
        D.jaccard_pairs(docs, 0.3).select("id1", "id2").localCheckpoint(eager=True)
    )
    edges = (
        pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
        .unionAll(pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst")))
        .localCheckpoint(eager=True)
    )
    store = spark._jsparkSession.sharedState().statusStore()

    def new_plans(action):
        prior = store.executionsList()
        before = prior.apply(prior.size() - 1).executionId() if prior.size() > 0 else -1
        action()
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
        execs = store.executionsList()
        out = []
        for i in range(execs.size() - 1, -1, -1):
            e = execs.apply(i)
            if e.executionId() <= before:
                break
            out.append(e.physicalPlanDescription())
        return out

    for tag, action in (
        ("clusters", lambda: D.duplicate_clusters(pairs).count()),
        ("pagerank", lambda: G.pagerank_q30(edges).count()),
    ):
        plans = new_plans(action)
        assert plans, tag  # the loop really registered executions
        offenders = [p for p in plans if "BroadcastHashJoin" in p]
        assert not offenders, (tag, offenders[0][:500] if offenders else "")
