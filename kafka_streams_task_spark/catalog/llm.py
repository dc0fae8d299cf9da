"""LLM-data-pipeline catalog: dedup, similarity search, text analysis,
multimodal plumbing — over the driver's documents/embeddings tables.

Oracles are provided wherever the semantics are SQL-expressible in DuckDB
(exact dedup, n-gram jaccard via inverted index, brute-force cosine top-k,
token statistics, multimodal metadata arithmetic). MinHash-LSH and
SimHash banding are genuinely non-SQL (seeded signatures / bit votes);
they get rows-only checks here plus planted-duplicate property tests in
tests/test_llm_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    STOPWORDS,
    avg_token_length,
    distinct_token_ratio,
    lang_id,
    quality_score,
    rolling_fingerprint,
    simhash64,
    stopword_ratio,
    token_count,
)
from ..operators.dedup import (
    dedup_exact,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from ..operators.multimodal import attach_asset_meta, decode_image_features
from ..operators.similarity import knn_bruteforce, knn_lsh
from ..schemas import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)


@query(
    "text_token_stats",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, string_split(trim(text), ' ') AS t FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(t) AS INT) AS n_tokens,
           CAST(len(list_distinct(t)) AS INT) AS n_distinct,
           round((CAST(len(list_distinct(t)) AS DOUBLE) / len(t)) + 1e-09, 6) AS distinct_ratio,
           round((list_sum(list_transform(t, x -> CAST(length(x) AS DOUBLE))) / len(t)) + 1e-09, 6) AS avg_tok_len,
           round((CAST(len(list_filter(t, x -> x IN ({_STOP_SQL}))) AS DOUBLE) / len(t)) + 1e-09, 6) AS stop_ratio
    FROM tok
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + lexical stats, all codegen column expressions."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        token_count("text").alias("n_tokens"),
        F.size(F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))).alias("n_distinct"),
        F.round((distinct_token_ratio("text")) + 1e-09, 6).alias("distinct_ratio"),
        F.round((avg_token_length("text")) + 1e-09, 6).alias("avg_tok_len"),
        F.round((stopword_ratio("text")) + 1e-09, 6).alias("stop_ratio"),
    )


@query(
    "text_quality_scores",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
    ), feats AS (
      SELECT doc_id,
             least(CAST(len(t) AS DOUBLE) / 100.0, 1.0) AS len_score,
             CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS diversity,
             CAST(len(list_filter(t, x -> x IN ({_STOP_SQL}))) AS DOUBLE) / len(t) AS stop
      FROM tok
    )
    SELECT doc_id,
           round(((len_score + diversity + (1.0 - abs(stop - 0.2))) / 3.0) + 1e-09, 6) AS quality
    FROM feats
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristic (length/diversity/stopword-ratio)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score("text").alias("quality"))


@query(
    "text_lang_id",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang AS labeled, text,
             list_distinct(string_split_regex(lower(text), '\\s+')) AS toks
      FROM documents
    ), scores AS (
      SELECT doc_id, labeled, text,
             [{'hits': len(list_intersect(toks, ['the','and','of','is','with'])), 'lang': 'en'},
              {'hits': len(list_intersect(toks, ['der','die','und','ist','nicht'])), 'lang': 'de'},
              {'hits': len(list_intersect(toks, ['el','la','que','de','es'])), 'lang': 'es'},
              {'hits': len(list_intersect(toks, ['le','la','et','est','les'])), 'lang': 'fr'}] AS sc
      FROM t
    )
    SELECT doc_id, labeled,
           CASE WHEN regexp_matches(text, '[\u4e00-\u9fff\u3040-\u30ff]') THEN 'zh'
                WHEN list_max(sc).hits > 0 THEN list_max(sc).lang
                ELSE 'und' END AS predicted
    FROM scores
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic vs the table's labeled lang column. The oracle
    mirrors the marker-hit argmax (lexicographic (hits, lang) max in both
    engines) and the CJK script check."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled"),
        lang_id("text").alias("predicted"),
    )


@query("text_fingerprints", oracle=None)  # xxhash64 seed is engine-specific: rows-only + determinism tests
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling-hash document fingerprints."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", rolling_fingerprint("text").alias("fingerprint"))


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_digest",
    oracle="""
    SELECT md5(text) AS digest, min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: digest-groupBy, lowest-id survivor per distinct text."""
    return dedup_exact(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(sh_list)) AS shingle
      FROM (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_transform(range(1, len(t) - 1),
                                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                    ELSE [array_to_string(t, ' ')] END AS sh_list
        FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents)
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round((CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)) + 1e-09, 6) AS jaccard
    FROM common
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
    WHERE round((CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)) + 1e-09, 6) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs >= 0.2 via inverted-index join (no cross
    join). The oracle mirrors the inverted-index formulation in SQL."""
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.2
    )


@query("dedup_minhash_lsh", oracle=None)  # seeded signatures: non-SQL; recall/precision asserted in tests
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs (128 hashes, 32 bands)."""
    return minhash_lsh_candidates(load_table(spark, sf_dir, "documents"))


@query("dedup_simhash", oracle=None)  # bit-vote hash: non-SQL; behavior asserted in tests
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3, 16-bit pigeonhole blocks)."""
    return simhash_near_dup_pairs(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@query(
    "similarity_knn_bruteforce",
    oracle="""
    WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round((list_dot_product(q.embedding, c.embedding)
                   / (sqrt(list_dot_product(q.embedding, q.embedding))
                      * sqrt(list_dot_product(c.embedding, c.embedding)))) + 1e-09, 6) AS sim
      FROM c, q
      WHERE c.vec_id != q.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
    """,
)
def similarity_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for query vectors vec_id < 10: broadcast queries,
    JVM-side dot products, per-query top-k."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_bruteforce(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query("similarity_knn_lsh", oracle=None)  # approximate: recall asserted against brute force in tests
def similarity_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH (4 tables x 8 bits)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_lsh(emb, emb.filter(F.col("vec_id") < 10), k=5)


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


@query(
    "multimodal_asset_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_asset_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary asset column + typed metadata struct. Payload is the utf-8
    encoding of text (the container has no media files); metadata extraction
    is the real production plumbing."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    with_meta = attach_asset_meta(d)
    return with_meta.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    )


@query(
    "multimodal_image_features",
    oracle="""
    SELECT doc_id,
           CAST((octet_length(encode(text)) % 64) + 1 AS INT) AS width,
           CAST(((octet_length(encode(text)) * 7) % 64) + 1 AS INT) AS height,
           3 AS n_channels
    FROM documents
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode plumbing with the deterministic stub decoder —
    the oracle mirrors the stub's arithmetic, so the Arrow batch path,
    schema, and row alignment are all hash-checked."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return decode_image_features(d)


@query(
    "text_bpe_token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '([a-zA-Z])([0-9])', '\1 \2', 'g'),
                 '([0-9])([a-zA-Z])', '\1 \2', 'g'),
               '([^a-zA-Z0-9\s])', ' \1 ', 'g')
           ), '\s+')) AS INT) AS n_bpe_tokens
    FROM documents
    """,
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword token counting (lookahead-free regex boundary
    splitting — the deterministic approximation of byte-pair granularity
    for cost estimation; identical rules mirrored in RE2 for the oracle)."""
    from ..functions.text import bpe_ish_tokens

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(bpe_ish_tokens("text")).alias("n_bpe_tokens"),
    )


@query("similarity_knn_ivf", oracle=None)  # approximate (sampled kmeans): recall vs brute force in tests
def similarity_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: sampled-kmeans coarse quantizer, nearest-list
    probing, exact rerank inside probed lists (operators/similarity.knn_ivf)."""
    from ..operators.similarity import knn_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ivf(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query(
    "dedup_survivors",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
    """,
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop_exact_duplicates: full-schema surviving rows (lowest id per
    distinct text), the operator a training-data pipeline actually applies."""
    from ..operators.dedup import drop_exact_duplicates

    d = load_table(spark, sf_dir, "documents")
    return drop_exact_duplicates(d).select("doc_id", "lang", "source")


@query("approx_aggregates", oracle=None)  # sketch algorithms are engine-specific: tolerance-tested in pytest
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB approximate toolkit: HyperLogLog++ distinct counts and
    quantile sketches — rows-only here (sketches differ across engines);
    tests/test_llm_ops.py bounds them against exact values."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
    )
