"""Connected-components clustering and sampling/packing operators."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafka_streams_task_spark.operators.cluster import (
    connected_components,
    dedup_survivors_by_cluster,
)
from kafka_streams_task_spark.operators.sampling import (
    hash_stratified_sample,
    pack_sequences,
    shuffle_deterministic,
)


def _cc_reference(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find ground truth: node -> min id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run_cc(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    # driver_threshold=0 forces the DISTRIBUTED star-contraction path: these
    # property tests exist to cover the iterative rounds, which the adaptive
    # small-graph fallback would otherwise bypass at test scale
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["node"]: r["component"]
        for r in connected_components(df, driver_threshold=0).collect()
    }


def test_cc_driver_and_distributed_paths_agree(spark):
    """The bounded driver-side union-find fallback must produce the exact
    (node, min-id component) mapping of the distributed rounds."""
    import random

    rng = random.Random(11)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    dist = {
        r["node"]: r["component"]
        for r in connected_components(df, driver_threshold=0).collect()
    }
    drv = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()  # 80 edges -> driver path
    }
    assert drv == dist == _cc_reference(edges)


class TestConnectedComponents:
    def test_long_path_collapses_to_min(self, spark):
        # path 0-1-2-...-63: worst case for label propagation (diameter 63);
        # star rounds must still converge within the O(log n) iteration cap
        edges = [(i, i + 1) for i in range(63)]
        got = _run_cc(spark, edges)
        assert got == {i: 0 for i in range(64)}

    def test_multiple_components_and_orientation(self, spark):
        # mixed orientations, duplicate edges, self-loop noise
        edges = [(5, 3), (3, 9), (20, 10), (10, 20), (7, 7), (30, 31)]
        got = _run_cc(spark, edges)
        assert got[3] == got[5] == got[9] == 3
        assert got[10] == got[20] == 10
        assert got[30] == got[31] == 30
        assert 7 not in got  # self-loops carry no connectivity

    def test_random_graphs_match_union_find(self, spark):
        import random

        rng = random.Random(7)
        for trial in range(3):
            n = 200
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(150)
            ]
            edges = [(a, b) for a, b in edges if a != b]
            assert _run_cc(spark, edges) == _cc_reference(edges), f"trial {trial}"

    def test_survivors_by_cluster_transitive(self, spark):
        # A~B, B~C: pairwise min-per-pair would keep 1 and 3; cluster
        # semantics keeps only 1 (plus the untouched 99)
        docs = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "a"), (99, "z")], ["doc_id", "text"]
        )
        pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
        kept = sorted(
            r["doc_id"] for r in dedup_survivors_by_cluster(docs, pairs).collect()
        )
        assert kept == [1, 99]


class TestSamplingPacking:
    def test_stratified_sample_deterministic_and_stratified(self, spark):
        df = spark.range(4000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, "web").otherwise("books").alias("source"),
        )
        rates = {"web": 0.25, "books": 1.0}
        s1 = hash_stratified_sample(df, rates, "source", "doc_id")
        s2 = hash_stratified_sample(df.repartition(13), rates, "source", "doc_id")
        r1 = {r["doc_id"] for r in s1.collect()}
        r2 = {r["doc_id"] for r in s2.collect()}
        assert r1 == r2  # pure function of ids — layout-independent
        books = sum(1 for i in r1 if i % 2 == 1)
        web = len(r1) - books
        assert books == 2000  # rate 1.0 keeps everything
        assert 300 <= web <= 700  # rate 0.25 of 2000, md5-uniform

    def test_stratified_sample_no_shuffle(self, spark):
        df = spark.range(100).select(
            F.col("id").alias("doc_id"), F.lit("web").alias("source")
        )
        sampled = hash_stratified_sample(df, {"web": 0.5}, "source", "doc_id")
        plan = sampled._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_pack_sequences_invariants(self, spark):
        docs = spark.createDataFrame(
            [(i, "w " * (1 + i % 40)) for i in range(500)], ["doc_id", "text"]
        )
        packed = pack_sequences(docs, budget=64)
        rows = packed.collect()
        # every doc exactly once
        assert sorted(r["doc_id"] for r in rows) == list(range(500))
        fills: dict[int, int] = {}
        for r in rows:
            fills[r["pack_id"]] = fills.get(r["pack_id"], 0) + r["n_tokens"]
        assert all(v <= 64 for v in fills.values())
        # packing actually packs: fewer packs than docs
        assert len(fills) < 500

    def test_pack_oversize_doc_isolated(self, spark):
        docs = spark.createDataFrame(
            [(1, "w " * 10), (2, "w " * 100), (3, "w " * 10)], ["doc_id", "text"]
        )
        rows = pack_sequences(docs, budget=32).collect()
        by_pack: dict[int, list[int]] = {}
        for r in rows:
            by_pack.setdefault(r["pack_id"], []).append(r["doc_id"])
        (big_pack,) = [p for p, ids in by_pack.items() if 2 in ids]
        assert by_pack[big_pack] == [2]  # oversize doc alone in its pack

    def test_pack_deterministic_across_layouts(self, spark):
        docs = spark.createDataFrame(
            [(i, "w " * (1 + i % 17)) for i in range(300)], ["doc_id", "text"]
        )
        a = {(r["pack_id"], r["doc_id"]) for r in pack_sequences(docs, 64, num_partitions=8).collect()}
        b = {
            (r["pack_id"], r["doc_id"])
            for r in pack_sequences(docs.repartition(3), 64, num_partitions=8).collect()
        }
        assert a == b


class TestChunking:
    def test_temperature_mix_rates_math(self, spark):
        from kafka_streams_task_spark.operators.sampling import temperature_mix_rates

        rows = (
            [(i, "web") for i in range(800)]
            + [(i + 1000, "books") for i in range(150)]
            + [(i + 2000, "wiki") for i in range(50)]
        )
        df = spark.createDataFrame(rows, ["doc_id", "source"])

        # T=1: natural mixture kept untouched
        assert temperature_mix_rates(df, "source", temperature=1.0) == {
            "web": 1.0,
            "books": 1.0,
            "wiki": 1.0,
        }

        # closed form: rate_s = (p_s/p_min)^(1/T - 1), rarest stratum = 1.0
        rates = temperature_mix_rates(df, "source", temperature=2.0)
        assert rates["wiki"] == 1.0
        assert abs(rates["web"] - (800 / 50) ** -0.5) < 1e-12
        assert abs(rates["books"] - (150 / 50) ** -0.5) < 1e-12

        # T -> inf equalizes expected per-stratum counts (to the rarest)
        hot = temperature_mix_rates(df, "source", temperature=1e9)
        kept = hash_stratified_sample(df, hot, "source", "doc_id")
        counts = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert counts["wiki"] == 50
        for s in ("web", "books"):
            assert abs(counts[s] - 50) < 25  # hash-sampling variance at n=50

        import pytest as _pytest

        with _pytest.raises(ValueError):
            temperature_mix_rates(df, "source", temperature=0.0)

    def test_shuffle_deterministic_layout_independent(self, spark):
        df = spark.range(1000).select(F.col("id").alias("doc_id"))
        seq_a = [
            (r["pid"], r["doc_id"])
            for r in shuffle_deterministic(df, seed=7, num_partitions=8)
            .withColumn("pid", F.spark_partition_id())
            .collect()
        ]
        seq_b = [
            (r["pid"], r["doc_id"])
            for r in shuffle_deterministic(df.repartition(13), seed=7, num_partitions=8)
            .withColumn("pid", F.spark_partition_id())
            .collect()
        ]
        # shard assignment AND in-shard order are pure functions of (id, seed)
        assert seq_a == seq_b
        # it is a permutation, and actually shuffled
        assert sorted(i for _, i in seq_a) == list(range(1000))
        assert [i for _, i in seq_a] != list(range(1000))

    def test_shuffle_deterministic_seed_and_balance(self, spark):
        df = spark.range(2000).select(F.col("id").alias("doc_id"))
        a = [r["doc_id"] for r in shuffle_deterministic(df, seed=1, num_partitions=8).collect()]
        b = [r["doc_id"] for r in shuffle_deterministic(df, seed=2, num_partitions=8).collect()]
        assert a != b and sorted(a) == sorted(b)
        # uniform 8-byte keys -> balanced shards (one Exchange, no skew)
        out = shuffle_deterministic(df, seed=1, num_partitions=8)
        sizes = [
            r["n"]
            for r in out.groupBy(F.spark_partition_id().alias("pid")).agg(F.count("*").alias("n")).collect()
        ]
        assert len(sizes) == 8 and max(sizes) < 2 * (2000 / 8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1

    def test_chunk_boundaries_and_overlap(self, spark):
        from kafka_streams_task_spark.operators.sampling import chunk_documents

        text = " ".join(f"w{i}" for i in range(10))  # w0..w9
        df = spark.createDataFrame([(1, text), (2, "short doc")], ["doc_id", "text"])
        rows = sorted(
            (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
            for r in chunk_documents(df, max_tokens=4, overlap=1).collect()
        )
        # doc 1: stride 3 -> starts 0,3,6 (chunk@6 reaches the end; a start
        # at 9 would add no new tokens and is not emitted)
        assert rows == [
            (1, 0, "w0 w1 w2 w3", 4),
            (1, 1, "w3 w4 w5 w6", 4),
            (1, 2, "w6 w7 w8 w9", 4),
            (2, 0, "short doc", 2),
        ]

    def test_chunk_no_redundant_trailing_chunks(self, spark):
        """Every chunk after the first must contribute at least one token
        not covered by any earlier chunk (the overlap>0 pathology: starts
        past n - max_tokens emit fully-contained chunks)."""
        from kafka_streams_task_spark.operators.sampling import chunk_documents

        docs = [
            (n, " ".join(f"w{i}" for i in range(n)))
            for n in (1, 5, 8, 9, 10, 16, 17, 31)
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        for max_tokens, overlap in [(8, 6), (8, 0), (4, 1), (16, 8)]:
            out = chunk_documents(df, max_tokens=max_tokens, overlap=overlap).collect()
            stride = max_tokens - overlap
            by_doc: dict[int, list] = {}
            for r in out:
                by_doc.setdefault(r["doc_id"], []).append(r)
            for n, _ in docs:
                cs = sorted(by_doc[n], key=lambda r: r["chunk_idx"])
                covered = 0
                for c in cs:
                    start = c["chunk_idx"] * stride
                    end = start + c["n_tokens"]
                    assert end > covered, (n, max_tokens, overlap, c)
                    covered = max(covered, end)
                # full coverage: the last chunk reaches the end of the doc
                assert covered == n, (n, max_tokens, overlap)

    def test_chunk_token_reconstruction(self, spark):
        from kafka_streams_task_spark.operators.sampling import chunk_documents

        df = spark.createDataFrame(
            [(i, " ".join(f"t{i}_{j}" for j in range(1 + i % 50))) for i in range(100)],
            ["doc_id", "text"],
        )
        out = chunk_documents(df, max_tokens=16, overlap=0).collect()
        # zero overlap: chunks partition the token stream exactly
        by_doc: dict[int, list] = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for i in range(100):
            cs = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
            rebuilt = " ".join(c["chunk_text"] for c in cs)
            assert rebuilt == " ".join(f"t{i}_{j}" for j in range(1 + i % 50))
            assert sum(c["n_tokens"] for c in cs) == 1 + i % 50

    def test_chunk_is_map_only(self, spark):
        from kafka_streams_task_spark.operators.sampling import chunk_documents

        df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        plan = chunk_documents(df, 2)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan


class TestDecontamination:
    def test_flags_overlapping_docs_only(self, spark):
        from kafka_streams_task_spark.operators.dedup import decontaminate

        bench = spark.createDataFrame(
            [("what is the capital of france paris obviously",)], ["text"]
        )
        corpus = spark.createDataFrame(
            [
                # contains the full benchmark 8-gram run
                (1, "intro text what is the capital of france paris obviously and more"),
                (2, "completely unrelated words about cooking pasta at home tonight"),
                # shares words but no 8-gram run
                (3, "the capital of spain is madrid france is nearby"),
            ],
            ["doc_id", "text"],
        )
        flagged = decontaminate(corpus, bench, shingle_n=8).collect()
        assert [r["doc_id"] for r in flagged] == [1]
        assert flagged[0]["n_contaminated_shingles"] >= 1

    def test_min_overlap_threshold_and_plan(self, spark):
        from kafka_streams_task_spark.operators.dedup import decontaminate

        bench = spark.createDataFrame([("a b c d e f g h i j k l",)], ["text"])
        corpus = spark.createDataFrame(
            [(1, "a b c d e f g h x y z w"), (2, "a b c d e f g h i j k l m")],
            ["doc_id", "text"],
        )
        out = decontaminate(corpus, bench, shingle_n=8, min_overlap=3)
        rows = out.collect()
        # doc 1 shares exactly one 8-gram (a..h); doc 2 shares five
        assert [r["doc_id"] for r in rows] == [2]
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_cc_hub_graph_no_materialized_neighborhoods(spark):
    """Power-law hub: node 0 connected to 1..500 plus chain noise. The
    join+agg star formulation must handle the hub without any per-node
    neighborhood list (the failure mode of collect_list formulations) and
    converge to a single component."""
    edges = [(0, i) for i in range(1, 501)] + [(500 + i, 501 + i) for i in range(40)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 541  # hub 0..500 plus chain tail 501..540


def test_empty_inputs_all_ops(spark):
    """Empty corpora must yield empty (not crashing) results across the
    training-pipeline surface — the degenerate case every scheduled
    production run eventually hits."""
    from pyspark.sql import types as T

    from kafka_streams_task_spark.operators.dedup import (
        decontaminate,
        dedup_exact,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
        simhash_near_dup_pairs,
    )
    from kafka_streams_task_spark.operators.sampling import chunk_documents

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    empty = spark.createDataFrame([], schema)
    bench = spark.createDataFrame([("some benchmark text here",)], ["text"])

    assert dedup_exact(empty).count() == 0
    assert minhash_lsh_candidates(empty).count() == 0
    assert ngram_jaccard_pairs(empty).count() == 0
    assert simhash_near_dup_pairs(empty).count() == 0
    assert decontaminate(empty, bench).count() == 0
    assert chunk_documents(empty, 16).count() == 0
    assert pack_sequences(empty, 64).count() == 0
    assert connected_components(
        spark.createDataFrame([], "src long, dst long")
    ).count() == 0
    assert hash_stratified_sample(empty, {"en": 1.0}, "text", "doc_id").count() == 0


def test_kmeans_distributed_recovers_planted_centers(spark):
    """Distributed Lloyd iterations recover 3 well-separated planted
    centers (within noise tolerance), and IVF search trained with them
    finds the planted nearest neighbor."""
    import numpy as np

    from kafka_streams_task_spark.operators.similarity import (
        kmeans_fit_distributed,
        knn_ivf,
    )

    rng = np.random.default_rng(11)
    centers = np.array(
        [[10.0] * 8, [-10.0] * 8, [10.0, -10.0] * 4], dtype="float64"
    )
    rows = []
    for i in range(300):
        c = i % 3
        rows.append((i, (centers[c] + rng.normal(0, 0.5, 8)).tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    got = kmeans_fit_distributed(df, n_clusters=3, n_iter=8)
    # each planted center matched by exactly one learned centroid, closely
    d = ((got[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2) ** 0.5
    assert sorted(d.argmin(axis=1)) == [0, 1, 2]
    assert d.min(axis=1).max() < 1.0

    # IVF search with distributed training: same-cluster neighbor at rank 1
    queries = df.filter(F.col("vec_id") < 3)
    out = knn_ivf(df, queries, k=1, n_clusters=3, n_probe=1, train="distributed")
    top = {r["query_id"]: r["neighbor_id"] for r in out.collect()}
    assert set(top) == {0, 1, 2}
    for q, n in top.items():
        assert n % 3 == q % 3  # neighbor from the same planted cluster


def test_full_training_pipeline_composes(spark):
    """Capstone: every training-data stage composed end to end on one
    corpus — exact dedup pairs -> transitive clusters -> survivors ->
    benchmark decontamination -> quality/PII filter -> deterministic
    stratified sample -> chunk -> pack -> vocab build -> id encoding ->
    epoch-order shuffle. Asserts each stage's contract on the way
    through; the point is that the stages COMPOSE (schemas line up, no
    stage breaks another's invariants)."""
    from pyspark.sql import Window

    from kafka_streams_task_spark.functions.text import pii_flags, repetition_ratio
    from kafka_streams_task_spark.operators.cluster import (
        dedup_survivors_by_cluster,
    )
    from kafka_streams_task_spark.operators.dedup import decontaminate
    from kafka_streams_task_spark.operators.sampling import (
        chunk_documents,
        pack_sequences,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n0 = base.count()

    # plant: exact-duplicate chains (multi-hop) + a benchmark-contaminated doc
    dup1 = base.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang"
    )
    dup2 = base.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text", "lang"
    )
    corpus = base.unionByName(dup1).unionByName(dup2)

    # 1. duplicate pairs from exact digests (consecutive within digest group)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    pairs = (
        corpus.select("doc_id", F.lag("doc_id").over(w).alias("prev"))
        .filter(F.col("prev").isNotNull())
        .select(F.col("prev").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    # 2. transitive clusters -> survivors (chains of 3 must collapse to one)
    survivors = dedup_survivors_by_cluster(corpus, pairs)
    n_surv = survivors.count()
    assert n_surv <= n0  # every planted duplicate died with its cluster

    # 3. decontamination against a fake benchmark (10 held-out docs)
    bench = base.filter(F.col("doc_id") % 37 == 0).select("text")
    flagged = decontaminate(survivors, bench, shingle_n=8)
    clean = survivors.join(flagged.select("doc_id"), "doc_id", "left_anti")
    assert clean.count() < n_surv  # the benchmark docs themselves got flagged

    # 4. quality & PII gate (synthetic corpus: keep non-repetitive docs)
    kept = clean.filter(
        (repetition_ratio("text") < 0.95)
        & (pii_flags("text")[0] == 0)
    )

    # 5. deterministic mixing, 6. chunking, 7. packing
    from kafka_streams_task_spark.operators.sampling import hash_stratified_sample

    sampled = hash_stratified_sample(
        kept, {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.5}, "lang", "doc_id"
    )
    # 5b. leakage-guarded split (group = lang here; domain in a crawl):
    # train-only docs proceed to chunk/pack, no group straddles splits
    from kafka_streams_task_spark.operators.sampling import (
        assign_splits,
        split_leakage_report,
    )

    split_all = assign_splits(
        sampled, {"train": 0.75, "val": 0.125, "test": 0.125}, group_col="lang"
    )
    assert split_leakage_report(split_all, "lang").count() == 0
    assert split_all.count() == sampled.count()
    sampled = split_all.filter(F.col("split") == "train").drop("split")
    assert sampled.count() > 0

    chunks = chunk_documents(sampled, max_tokens=64)
    packed = pack_sequences(
        chunks.withColumn(
            "chunk_uid", F.col("doc_id") * 1000 + F.col("chunk_idx")
        ),
        budget=256,
        id_col="chunk_uid",
        n_tokens_col="n_tokens",
    )
    # conservation through the chunk->pack boundary
    assert packed.count() == chunks.count()
    t_in = chunks.agg(F.sum("n_tokens")).first()[0]
    t_out = packed.agg(F.sum("n_tokens")).first()[0]
    assert t_in == t_out
    fills = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("n")
    )
    assert fills.filter((F.col("fill") > 256) & (F.col("n") > 1)).count() == 0

    # 8. vocab + encoding over the surviving chunks, 9. epoch-order shuffle
    from kafka_streams_task_spark.operators.sampling import shuffle_deterministic
    from kafka_streams_task_spark.operators.vocab import build_vocab, encode_documents

    chunk_docs = chunks.select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("chunk_uid"),
        F.col("chunk_text"),
    )
    vocab = build_vocab(chunk_docs, text_col="chunk_text", min_count=2).persist()
    encoded = encode_documents(
        chunk_docs, vocab, id_col="chunk_uid", text_col="chunk_text"
    )
    # encoding conserves tokens; in-vocab tokens resolve to dense ids
    assert encoded.agg(F.sum("n_tokens")).first()[0] == t_in
    v = vocab.count()
    bad = encoded.filter(
        F.exists("token_ids", lambda i: (i >= F.lit(v)) | (i < F.lit(-1)))
    )
    assert bad.count() == 0
    epoch = shuffle_deterministic(encoded, seed=3, id_col="chunk_uid", num_partitions=4)
    assert epoch.count() == encoded.count()


def test_unigram_nll_ranks_gibberish_above_typical(spark):
    from kafka_streams_task_spark.operators.sampling import unigram_nll_scores

    common = "the cat sat on the mat and the dog sat too"
    rows = [(i, common) for i in range(20)]
    rows.append((100, "zxqv jkwp fhgt bnml qwer"))  # gibberish: all-rare tokens
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in unigram_nll_scores(df).collect()}
    typical = got[0]["avg_nll"]
    gibberish = got[100]["avg_nll"]
    assert gibberish > typical + 1.0  # clearly separable
    assert got[0]["n_tokens"] == 11
    # python ground truth for one token: p(the) with add-one smoothing
    import math

    n_total = 20 * 11 + 5
    n_vocab = 8 + 5  # distinct tokens in common text + 5 gibberish
    p_the = (20 * 3 + 1) / (n_total + n_vocab)
    assert any(
        abs(-math.log(p_the) - v) < 2.0 for v in [typical]
    )  # same order of magnitude sanity


def test_near_dup_chain_collapses_via_cc(spark):
    """MinHash-LSH pairs feed connected components: a chain of successive
    near-duplicates (full doc, last token dropped, last two dropped, ...)
    must collapse into ONE cluster even when the chain's endpoints are not
    direct LSH candidates of each other — exactly why cluster-level
    survivor selection exists."""
    import random

    from kafka_streams_task_spark.operators.cluster import dup_clusters
    from kafka_streams_task_spark.operators.dedup import minhash_lsh_candidates

    rng = random.Random(3)
    vocab = [f"tok{i}" for i in range(300)]
    docs = []
    for d in range(8):
        base = [rng.choice(vocab) for _ in range(60)]
        for step in range(4):  # 4-link chain per family, ids d*10+step
            docs.append((d * 10 + step, " ".join(base[: 60 - 2 * step])))
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    pairs = minhash_lsh_candidates(df)
    comps = {r["node"]: r["component"] for r in dup_clusters(pairs).collect()}
    for d in range(8):
        fam = [d * 10 + s for s in range(4)]
        roots = {comps.get(i) for i in fam}
        assert roots == {d * 10}, f"family {d} split into {roots}"
    # no cross-family merges
    assert len(set(comps.values())) == 8


def test_ragged_embeddings_do_not_crash_ann(spark):
    """Null and wrong-dimension vectors (ingest reality) must be dropped by
    the Arrow stages, not crash the numpy matmul with a ragged object
    array — both the LSH bucketing and IVF assignment paths."""
    import numpy as np

    from kafka_streams_task_spark.operators.dedup import embedding_near_dup_pairs
    from kafka_streams_task_spark.operators.similarity import knn_ivf, knn_lsh

    rng = np.random.default_rng(5)
    rows = [(i, rng.standard_normal(64).tolist()) for i in range(50)]
    rows.append((100, None))                                  # null vector
    rows.append((101, rng.standard_normal(16).tolist()))      # wrong dim
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter("vec_id < 3")

    assert knn_lsh(df, queries, k=2).count() >= 0
    assert knn_ivf(df, queries, k=2, n_clusters=4).count() >= 0
    pairs = embedding_near_dup_pairs(df, threshold=0.99)
    bad = {100, 101}
    assert all(r["id_a"] not in bad and r["id_b"] not in bad for r in pairs.collect())


def test_cap_per_group_deterministic_and_bounded(spark):
    from kafka_streams_task_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(i, "big" if i < 80 else ("mid" if i < 95 else "tiny")) for i in range(100)],
        ["doc_id", "source"],
    )
    capped = cap_per_group(df, "source", 10, seed=7)
    sizes = {r["source"]: r["n"] for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"big": 10, "mid": 10, "tiny": 5}  # small groups intact

    # layout independence: same kept set regardless of partitioning
    a = {r["doc_id"] for r in capped.collect()}
    b = {
        r["doc_id"]
        for r in cap_per_group(df.repartition(13, "source"), "source", 10, seed=7).collect()
    }
    assert a == b

    # a different seed selects a different subset of the big group
    c = {r["doc_id"] for r in cap_per_group(df, "source", 10, seed=8).collect()}
    assert {x for x in a if x < 80} != {x for x in c if x < 80}


def test_cap_per_group_plan_uses_window_group_limit(spark):
    """The rank filter must push into WindowGroupLimit so mega-groups
    collapse map-side before the shuffle."""
    import io
    from contextlib import redirect_stdout

    from kafka_streams_task_spark.operators.sampling import cap_per_group

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("source")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        cap_per_group(df, "source", 5).explain()
    assert "WindowGroupLimit" in buf.getvalue()


# ------------------------------------------------- weighted sampling (A-ES)


def _es_key(doc_id, seed, w):
    import hashlib

    h = int(hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:8], 16)
    u = (h + 0.5) / 4294967296.0
    return u ** (1.0 / w)


def test_weighted_sample_matches_python_reference(spark):
    from pyspark.sql import Row

    from kafka_streams_task_spark.operators.sampling import weighted_sample

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(200)]
    df = spark.createDataFrame([Row(doc_id=i, w=w) for i, w in rows])
    got = [
        (r.doc_id, r.sample_rank)
        for r in weighted_sample(df, "w", k=25, seed=9).collect()
    ]
    ref = sorted(rows, key=lambda t: (-_es_key(t[0], 9, t[1]), t[0]))[:25]
    assert sorted(got, key=lambda t: t[1]) == [
        (doc_id, rank + 1) for rank, (doc_id, _) in enumerate(ref)
    ]


def test_weighted_sample_prefers_heavy_rows(spark):
    from pyspark.sql import Row

    from kafka_streams_task_spark.operators.sampling import weighted_sample

    # 500 light rows (w=1) vs 500 heavy rows (w=50): a 100-row sample
    # must be dominated by heavy rows
    df = spark.createDataFrame(
        [Row(doc_id=i, w=50.0 if i < 500 else 1.0) for i in range(1000)]
    )
    got = weighted_sample(df, "w", k=100, seed=3).collect()
    heavy = sum(1 for r in got if r.doc_id < 500)
    assert heavy > 85, f"heavy rows underrepresented: {heavy}/100"


def test_weighted_sample_layout_independent_and_guards(spark):
    from pyspark.sql import Row

    from kafka_streams_task_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [Row(doc_id=i, w=float(i % 5)) for i in range(100)]  # w=0 rows excluded
    )
    a = {(r.doc_id, r.sample_rank) for r in weighted_sample(df.repartition(1), "w", k=10).collect()}
    b = {(r.doc_id, r.sample_rank) for r in weighted_sample(df.repartition(7, "w"), "w", k=10).collect()}
    assert a == b
    assert all(doc_id % 5 != 0 for doc_id, _ in a), "zero-weight rows sampled"


def test_weighted_sample_per_group(spark):
    from pyspark.sql import Row

    from kafka_streams_task_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [Row(doc_id=i, g=i % 3, w=1.0 + i % 4) for i in range(90)]
    )
    got = weighted_sample(df, "w", k=5, group_cols=["g"]).collect()
    per_g = {}
    for r in got:
        per_g.setdefault(r.g, []).append(r.sample_rank)
    assert set(per_g) == {0, 1, 2}
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_g.values())


def test_weighted_sample_global_uses_take_ordered(spark):
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import Row

    from kafka_streams_task_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([Row(doc_id=i, w=1.0) for i in range(50)])
    buf = io.StringIO()
    with redirect_stdout(buf):
        weighted_sample(df, "w", k=5).explain()
    assert "TakeOrderedAndProject" in buf.getvalue()


class TestAssignSplits:
    """assign_splits leakage-guarded splitting + split_leakage_report."""

    def _docs(self, spark):
        rows = [(i, f"dom{i % 7}") for i in range(200)]
        return spark.createDataFrame(rows, ["doc_id", "domain"])

    def test_group_hash_prevents_leakage(self, spark):
        from kafka_streams_task_spark.operators.sampling import (
            assign_splits,
            split_leakage_report,
        )

        d = self._docs(spark)
        out = assign_splits(
            d, {"train": 0.5, "val": 0.25, "test": 0.25}, group_col="domain"
        )
        # every domain lands in exactly one split
        assert split_leakage_report(out, "domain").count() == 0
        # coverage: every row assigned, names from the weight dict
        rows = out.collect()
        assert len(rows) == 200
        assert {r.split for r in rows} <= {"train", "val", "test"}
        # deterministic: re-running (and on a different layout) agrees
        again = assign_splits(
            d.repartition(7),
            {"train": 0.5, "val": 0.25, "test": 0.25},
            group_col="domain",
        )
        assert sorted((r.doc_id, r.split) for r in rows) == sorted(
            (r.doc_id, r.split) for r in again.collect()
        )

    def test_per_row_split_and_weight_proportions(self, spark):
        from kafka_streams_task_spark.operators.sampling import assign_splits

        d = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
        out = assign_splits(d, {"a": 3.0, "b": 1.0})  # normalized 0.75/0.25
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert abs(counts["a"] / 4000 - 0.75) < 0.03
        assert abs(counts["b"] / 4000 - 0.25) < 0.03

    def test_null_key_gets_null_split(self, spark):
        from kafka_streams_task_spark.operators.sampling import assign_splits

        d = spark.createDataFrame([(1, "x"), (2, None)], ["doc_id", "domain"])
        rows = {r.doc_id: r.split for r in
                assign_splits(d, {"train": 1.0}, group_col="domain").collect()}
        assert rows[1] == "train" and rows[2] is None

    def test_salt_moves_assignment_and_validation(self, spark):
        from kafka_streams_task_spark.operators.sampling import assign_splits

        d = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        a = {r.doc_id: r.split for r in
             assign_splits(d, {"x": 1, "y": 1}).collect()}
        b = {r.doc_id: r.split for r in
             assign_splits(d, {"x": 1, "y": 1}, salt="v2").collect()}
        assert a != b, "salt must re-draw assignments"
        with pytest.raises(ValueError, match="positive"):
            assign_splits(d, {"x": 0.0})
        with pytest.raises(ValueError, match="at least one"):
            assign_splits(d, {})

    def test_no_shuffle_plan(self, spark):
        from kafka_streams_task_spark.operators.sampling import assign_splits

        d = spark.range(0, 10).withColumnRenamed("id", "doc_id")
        plan = (
            assign_splits(d, {"train": 0.75, "val": 0.25})
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Python" not in plan


def test_assign_splits_salted_null_key_stays_null(spark):
    """With a salt, NULL-key rows must still get a NULL split — concat_ws
    would silently rebind them all to the constant salt (review r7)."""
    from kafka_streams_task_spark.operators.sampling import assign_splits

    d = spark.createDataFrame([(1, "x"), (2, None), (3, None)], ["doc_id", "domain"])
    rows = {r.doc_id: r.split for r in
            assign_splits(d, {"a": 1, "b": 1}, group_col="domain", salt="v2").collect()}
    assert rows[2] is None and rows[3] is None
    assert rows[1] in ("a", "b")
