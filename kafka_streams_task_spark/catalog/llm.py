"""LLM-data-pipeline catalog: dedup, similarity search, text analysis,
multimodal plumbing — over the driver's documents/embeddings tables.

Every entry is oracle-backed. Where raw outputs are SQL-expressible
(exact dedup, n-gram jaccard via inverted index, brute-force cosine top-k,
token statistics, md5 fingerprints, multimodal metadata arithmetic) the
oracle recomputes them. The seeded/approximate operators (MinHash-LSH,
SimHash, LSH/IVF kNN, sketches) are driver-verified through SQL-checkable
INVARIANTS instead — planted-pair recall counts, per-query recall-vs-
brute-force gates, tolerance booleans — computed inside the same plan;
their raw outputs keep planted-duplicate property tests in
tests/test_llm_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    GOPHER_STOPWORDS,
    STOPWORDS,
    WHITESPACE_RE,
    avg_token_length,
    distinct_token_ratio,
    gopher_quality_columns,
    lang_id,
    pii_flags,
    quality_score,
    repetition_ratio,
    rolling_fingerprint_portable,
    stopword_ratio,
    token_count,
    tokens,
)
from ..operators.dedup import (
    decontaminate,
    dedup_exact,
    embedding_near_dup_pairs,
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
      SELECT doc_id, lang, string_split_regex(trim(text), '[ \\t\\n\\r\\f]+') AS t FROM documents
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
        F.size(F.array_distinct(F.split(F.trim(F.col("text")), WHITESPACE_RE))).alias("n_distinct"),
        F.round((distinct_token_ratio("text")) + 1e-09, 6).alias("distinct_ratio"),
        F.round((avg_token_length("text")) + 1e-09, 6).alias("avg_tok_len"),
        F.round((stopword_ratio("text")) + 1e-09, 6).alias("stop_ratio"),
    )


_GOPHER_STOP_SQL = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)


@query(
    "text_quality_scores",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, text, string_split_regex(trim(text), '[ \\t\\n\\r\\f]+') AS t,
             string_split(text, chr(10)) AS ln
      FROM documents
    ), feats AS (
      SELECT doc_id, text, t, ln,
             least(CAST(len(t) AS DOUBLE) / 100.0, 1.0) AS len_score,
             CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS diversity,
             CAST(len(list_filter(t, x -> x IN ({_STOP_SQL}))) AS DOUBLE) / len(t) AS stop,
             CASE WHEN len(t) >= 3
                  THEN list_transform(range(1, len(t) - 1),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                  ELSE [array_to_string(t, ' ')] END AS sh,
             round((list_sum(list_transform(t, x -> CAST(length(x) AS DOUBLE))) / len(t)) + 1e-09, 6) AS mean_word_len,
             round(((CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
                     + CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE) / 3)
                    / len(t)) + 1e-09, 6) AS symbol_word_ratio,
             round((CAST(len(list_filter(ln, x -> regexp_matches(x, '^[ \\t\\r\\f]*[-*•]'))) AS DOUBLE) / len(ln)) + 1e-09, 6) AS bullet_line_ratio,
             round((CAST(len(list_filter(ln, x -> regexp_matches(x, '\\.\\.\\.[ \\t\\r\\f]*$'))) AS DOUBLE) / len(ln)) + 1e-09, 6) AS ellipsis_line_ratio,
             round((CAST(len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(t)) + 1e-09, 6) AS alpha_word_ratio,
             CAST(len(list_intersect(list_distinct(list_transform(t, x -> lower(x))),
                                     [{_GOPHER_STOP_SQL}])) AS INT) AS gopher_stop_hits
      FROM tok
    )
    SELECT doc_id,
           round(((len_score + diversity + (1.0 - abs(stop - 0.2))) / 3.0) + 1e-09, 6) AS quality,
           round((1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh)) + 1e-09, 6) AS rep_3gram,
           CAST(regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}') AS INT) AS has_email,
           CAST(regexp_matches(text, '\\b[0-9]{{3}}[-. ][0-9]{{3}}[-. ][0-9]{{4}}\\b') AS INT) AS has_phone,
           CAST(regexp_matches(text, '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b') AS INT) AS has_ipv4,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[PII]', 'g'),
             '\\b[0-9]{{3}}[-. ][0-9]{{3}}[-. ][0-9]{{4}}\\b', '[PII]', 'g'),
             '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b', '[PII]', 'g')
             AS text_redacted,
           CAST(len(t) AS INT) AS n_words,
           mean_word_len, symbol_word_ratio, bullet_line_ratio,
           ellipsis_line_ratio, alpha_word_ratio, gopher_stop_hits,
           CAST((len(t) >= 50 AND len(t) <= 100000
                 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                 AND symbol_word_ratio <= 0.1
                 AND bullet_line_ratio <= 0.9
                 AND ellipsis_line_ratio <= 0.3
                 AND alpha_word_ratio >= 0.8
                 AND gopher_stop_hits >= 2) AS INT) AS gopher_pass
    FROM feats
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter feature set (r2: widened from the single composite):
    composite quality heuristic (length/diversity/stopword-ratio), duplicated-
    trigram repetition ratio (boilerplate/looping-generation detector), the
    classic PII scrub flags (email/phone/ipv4) plus the scrub TRANSFORM
    itself (r4: ``text_redacted`` — the chained redaction output compared
    byte-for-byte against the oracle's replacement chain), and the full
    Gopher rule set (Rae et al. 2021 App. A1.1: word-count bounds, mean
    word length, symbol-to-word ratio, bullet/ellipsis line ratios,
    alpha-word ratio, stopword hits, combined pass flag) — every column a
    codegen expression, every column recomputed exactly by the DuckDB
    oracle."""
    from ..functions.text import redact_pii

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        quality_score("text").alias("quality"),
        F.round(repetition_ratio("text") + 1e-09, 6).alias("rep_3gram"),
        *pii_flags("text"),
        redact_pii("text").alias("text_redacted"),
        *gopher_quality_columns("text"),
    )


@query(
    "text_lang_id",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang AS labeled, text,
             list_distinct(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+')) AS toks
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


@query(
    "text_fingerprints",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\r\\f]+') AS t FROM documents)
    SELECT doc_id,
           list_min(list_transform(range(0, greatest(len(t) - 8, 0) + 1),
                    i -> substr(md5(array_to_string(t[i+1:i+8], ' ')), 1, 16))) AS fingerprint
    FROM tok
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling-hash document fingerprints, using the
    portable md5 variant so the fingerprint VALUES are oracle-checked (the
    in-engine default is the cheaper xxhash64 ``rolling_fingerprint``; same
    window/selection semantics, pinned equivalent by construction)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", rolling_fingerprint_portable("text").alias("fingerprint"))


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
        FROM (SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\r\\f]+') AS t FROM documents)
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


@query(
    "dedup_minhash_lsh_recall",
    oracle="""
    SELECT count(*) AS n_planted, CAST(0 AS BIGINT) AS n_missed
    FROM documents
    WHERE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) >= 20
    """,
)
def dedup_minhash_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end MinHash-LSH gate with a SQL-checkable invariant: plant a
    near-duplicate (last token dropped) of every document with >= 20 tokens,
    run the full candidate pipeline (128 hashes, 32 bands) on the doubled
    corpus, and report how many planted pairs the banding missed. A planted
    pair has 3-gram Jaccard >= (T-5)/(T-2) >= 0.83, so the per-pair miss
    probability under the seeded banding is ~1e-9 — n_missed must be 0,
    which the DuckDB oracle states exactly (it can count the planted pairs,
    and the zero-miss claim IS the LSH recall property). The raw candidate
    operator stays covered by planted-pair property tests."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = F.split(F.trim(F.col("text")), WHITESPACE_RE)
    eligible = d.filter(F.size(t) >= 20)
    planted = eligible.select(
        (F.col("doc_id") + F.lit(1000000)).alias("doc_id"),
        F.array_join(F.slice(t, 1, F.size(t) - 1), " ").alias("text"),
    )
    cands = minhash_lsh_candidates(d.unionByName(planted))
    expected = eligible.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + F.lit(1000000)).alias("id_b")
    )
    missed = expected.join(cands, on=["id_a", "id_b"], how="left_anti")
    return expected.agg(F.count(F.lit(1)).alias("n_planted")).crossJoin(
        missed.agg(F.count(F.lit(1)).alias("n_missed"))
    )


@query(
    "dedup_simhash_recall",
    oracle="""
    SELECT count(*) AS n_planted, CAST(0 AS BIGINT) AS n_missed
    FROM documents
    """,
)
def dedup_simhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end SimHash gate with a SQL-checkable invariant: plant an
    exact copy of every document, run the full pipeline (64-bit bit-vote
    simhash, 16-bit pigeonhole blocks, hamming <= 3 verification) on the
    doubled corpus, and report missed planted pairs. Identical text gives
    an identical simhash, so every planted pair is GUARANTEED to share all
    four blocks and verify at hamming 0 — n_missed must be exactly 0. The
    discriminative (near-dup) behavior is covered by the single-token-edit
    property test."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.select((F.col("doc_id") + F.lit(1000000)).alias("doc_id"), "text")
    pairs = simhash_near_dup_pairs(d.unionByName(planted))
    expected = d.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + F.lit(1000000)).alias("id_b")
    )
    missed = expected.join(pairs, on=["id_a", "id_b"], how="left_anti")
    return expected.agg(F.count(F.lit(1)).alias("n_planted")).crossJoin(
        missed.agg(F.count(F.lit(1)).alias("n_missed"))
    )


@query(
    "dedup_embedding_cosine_recall",
    oracle="""
    SELECT count(*) AS n_planted, CAST(0 AS BIGINT) AS n_missed
    FROM embeddings
    WHERE list_sum(list_transform(embedding, x -> CAST(x*x AS DOUBLE))) > 0
    """,
)
def dedup_embedding_cosine_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end embedding-cosine near-dup gate with a SQL-checkable
    invariant: plant an exact copy of every nonzero embedding, run the full
    pipeline (8 random-hyperplane LSH tables of 8 sign bits, exact cosine
    verification at threshold 0.99) on the doubled corpus, and report
    missed planted pairs. Identical float values give identical sign bits
    in EVERY table, so each planted pair is guaranteed to share all 8
    buckets and verify at cosine 1.0 — n_missed must be exactly 0, which
    the DuckDB oracle states directly. The discriminative (perturbed-copy)
    behavior is covered by the recall property test in test_llm_ops.py."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    norm2 = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    eligible = e.filter(norm2 > 0)
    planted = eligible.select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"), "embedding"
    )
    pairs = embedding_near_dup_pairs(
        eligible.unionByName(planted), threshold=0.99
    )
    expected = eligible.select(
        F.col("vec_id").alias("id_a"), (F.col("vec_id") + F.lit(1000000)).alias("id_b")
    )
    missed = expected.join(pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
    return expected.agg(F.count(F.lit(1)).alias("n_planted")).crossJoin(
        missed.agg(F.count(F.lit(1)).alias("n_missed"))
    )


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


def _knn_recall_gate(
    queries_df: DataFrame, exact: DataFrame, approx: DataFrame, k: int, floor: float
) -> DataFrame:
    """Per-query recall-vs-brute-force gate: (query_id, n_results,
    recall_ok). Both top-k sets are computed in the same plan; the oracle
    can state the expected shape (k results, recall above the floor) in
    plain SQL because the floor claim is deterministic under fixed seeds."""
    hits = (
        approx.join(exact.select("query_id", "neighbor_id"), on=["query_id", "neighbor_id"], how="left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_n_hits"))
    )
    counts = approx.groupBy("query_id").agg(F.count(F.lit(1)).alias("_n_results"))
    base = queries_df.select(F.col("vec_id").alias("query_id"))
    return (
        base.join(counts, on="query_id", how="left")
        .join(hits, on="query_id", how="left")
        .select(
            "query_id",
            F.coalesce(F.col("_n_results"), F.lit(0)).alias("n_results"),
            (F.coalesce(F.col("_n_hits"), F.lit(0)) / float(k) >= floor).cast("int").alias("recall_ok"),
        )
    )


@query(
    "similarity_knn_lsh_recall",
    oracle="""
    SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_results, CAST(1 AS INT) AS recall_ok
    FROM embeddings WHERE vec_id < 10
    """,
)
def similarity_knn_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH, gated per query against
    the exact brute-force top-5 computed in the same plan: every query must
    return a full k results with recall >= 0.4. This makes the approximate
    operator's OUTPUT driver-verified, not just pytest-verified.

    Params/floor are tuned to the driver's synthetic embeddings, which are
    near-uniform (neighbor cosine margins are thin, the hard case for LSH):
    4 planes x 8 tables examines ~50% of the corpus and still bottoms out
    at 0.4 per-query recall (measured 0.4-1.0 at sf0.001/0.01/0.1, fully
    deterministic under the fixed hyperplane seed). A clustered real-world
    embedding corpus supports tighter buckets; the floor here checks the
    pipeline, the pytest planted-structure test checks discrimination."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = knn_bruteforce(emb, q, k=5)
    approx = knn_lsh(emb, q, k=5, n_planes=4, n_tables=8)
    return _knn_recall_gate(q, exact, approx, k=5, floor=0.4)


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
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \t\n\r\f]+') AS words
      FROM documents
    )
    SELECT d.doc_id,
           CAST(len(string_split_regex(trim(
             regexp_replace(
               regexp_replace(
                 regexp_replace(d.text, '([a-zA-Z])([0-9])', '\1 \2', 'g'),
                 '([0-9])([a-zA-Z])', '\1 \2', 'g'),
               '([^a-zA-Z0-9 \t\n\r\f])', ' \1 ', 'g')
           ), '[ \t\n\r\f]+')) AS INT) AS n_bpe_tokens,
           CAST(list_sum(list_transform(t.words, x -> length(x))) AS BIGINT)
             AS bpe_char_mass,
           CAST(len(t.words) AS BIGINT) AS bpe_word_marks
    FROM documents d JOIN t ON d.doc_id = t.doc_id
    """,
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword tokenization under the driver hash gate, two tokenizers:

    n_bpe_tokens — the regex boundary approximation (bpe_ish_tokens),
    recomputed exactly by the RE2 oracle (cheap cost-estimation path).

    bpe_char_mass / bpe_word_marks — a REAL trained BPE tokenizer
    (operators/bpe.py: distributed pair-merge training on this very
    corpus, 64 merges in disjoint batches of 16, then the memoized encoder)
    checked through its conservation laws, which hold for ANY valid merge
    sequence and therefore are SQL-stateable without the oracle knowing
    the learned merges: stripping the end-of-word markers from a doc's
    subwords must restore exactly the document's character mass
    (lossless-ness), and exactly one marker-bearing subword must exist per
    word (boundary preservation). A merge that loses, duplicates, or
    crosses word boundaries breaks a column. The learned-merge SEQUENCE
    itself is pinned against a pure-Python reference implementation in
    tests/test_bpe.py."""
    from ..functions.text import bpe_ish_tokens
    from ..operators.bpe import EOW, bpe_encode, bpe_train

    d = load_table(spark, sf_dir, "documents")
    merges = bpe_train(d, n_merges=64, batch_k=16)
    enc = bpe_encode(d, merges)
    bpe_cols = enc.select(
        "doc_id",
        F.aggregate(
            F.transform(
                F.col("subwords"),
                lambda s: F.length(F.replace(s, F.lit(EOW), F.lit(""))).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("bpe_char_mass"),
        F.size(
            F.filter(F.col("subwords"), lambda s: s.contains(EOW))
        ).cast("long").alias("bpe_word_marks"),
    )
    return d.select(
        "doc_id",
        F.size(bpe_ish_tokens("text")).alias("n_bpe_tokens"),
    ).join(bpe_cols, on="doc_id")


@query(
    "similarity_knn_ivf_recall",
    oracle="""
    SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_results, CAST(1 AS INT) AS recall_ok,
           CAST(5 AS BIGINT) AS n_results_pq, CAST(1 AS INT) AS recall_pq_ok
    FROM embeddings WHERE vec_id < 10
    """,
)
def similarity_knn_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 (sampled-kmeans coarse quantizer, nearest-list
    probing, exact rerank inside probed lists), gated per query against the
    brute-force top-5 in the same plan: full k results, recall >= 0.8
    (deterministic under the fixed kmeans seed; probes 12 of 16 lists —
    the driver's near-uniform synthetic vectors need wide probing, see
    similarity_knn_lsh_recall; a probed-vs-unprobed audit at sf0.01 showed
    every missed neighbor sat in an UNPROBED list, i.e. recall here is
    coarse-probe-bound, not quantization-bound).

    r4 added the IVF-PQ path to the same gate (n_results_pq /
    recall_pq_ok); r5 raised the per-query floor 0.6 -> 0.8 for both legs
    after switching PQ to RESIDUAL coding (Jégou et al. §III-B — codes
    carry x_norm - c_norm(list), the exact q·c term rides with the query)
    and widening probing/rerank: ADC top-96 exactly reranked. Measured
    per-query recall at the driver scale: min 0.8, mean 0.92 (both legs)."""
    from ..operators.similarity import knn_ivf, knn_ivf_pq

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = knn_bruteforce(emb, q, k=5)
    approx = knn_ivf(emb, q, k=5, n_probe=12)
    gate = _knn_recall_gate(q, exact, approx, k=5, floor=0.8)
    approx_pq = knn_ivf_pq(emb, q, k=5, n_probe=12, ks=64, rerank_k=96)
    gate_pq = _knn_recall_gate(q, exact, approx_pq, k=5, floor=0.8).select(
        "query_id",
        F.col("n_results").alias("n_results_pq"),
        F.col("recall_ok").alias("recall_pq_ok"),
    )
    return gate.join(gate_pq, on="query_id")


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


@query(
    "approx_aggregates",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts_exact,
           round((quantile_cont(l_extendedprice, 0.5)) + 1e-07, 4) AS med_price_exact,
           CAST(1 AS INT) AS approx_parts_ok,
           CAST(1 AS INT) AS approx_median_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB approximate toolkit — HyperLogLog++ distinct counts and
    quantile sketches — gated against the exact aggregates computed in the
    same plan. Sketch VALUES are engine-specific, so the driver-checkable
    claim is the tolerance: both approximations within 5% relative error
    of the exact answers (HLL++ default rsd = 0.05; percentile_approx
    accuracy 10000). An engine bug in either sketch flips the booleans and
    fails the value hash."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts_exact"),
        F.percentile("l_extendedprice", 0.5).alias("_med_exact"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("_apx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("_apx_med"),
    )
    return exact.join(approx, on="l_returnflag").select(
        "l_returnflag",
        "n_parts_exact",
        F.round(F.col("_med_exact") + 1e-07, 4).alias("med_price_exact"),
        (F.abs(F.col("_apx_parts") - F.col("n_parts_exact")) / F.col("n_parts_exact") <= 0.05)
        .cast("int")
        .alias("approx_parts_ok"),
        (F.abs(F.col("_apx_med") - F.col("_med_exact")) / F.col("_med_exact") <= 0.05)
        .cast("int")
        .alias("approx_median_ok"),
    )


# ---------------------------------------------------------------------------
# Duplicate clustering (connected components) and sampling / packing
# ---------------------------------------------------------------------------


@query(
    "dedup_clusters_cc",
    oracle="""
    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS cluster_id
    FROM documents
    """,
)
def dedup_clusters_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components duplicate clustering, oracle-checked end to end:
    build a PATH graph per exact-duplicate group (consecutive doc_ids under
    the same md5 digest — multi-hop chains, so the star contractions must
    actually iterate, not just read off single edges), run the alternating
    large-star/small-star algorithm (operators/cluster.py), and label every
    document with its cluster root. A document's root is provably the
    minimum doc_id sharing its text, which the DuckDB oracle states as a
    window min over the digest partition. Near-dup edge sets (MinHash/
    SimHash pairs) feed the same operator in production; the exact-dup
    edge set is the deterministic, SQL-checkable instance."""
    from pyspark.sql import Window

    from ..operators.cluster import connected_components

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("dg")
    )
    w = Window.partitionBy("dg").orderBy("doc_id")
    edges = (
        d.select("doc_id", F.lag("doc_id").over(w).alias("prev"))
        .filter(F.col("prev").isNotNull())
        .select(F.col("prev").alias("src"), F.col("doc_id").alias("dst"))
    )
    comps = connected_components(edges)
    singles = d.join(
        comps, d.doc_id == comps.node, "left_anti"
    ).select("doc_id", F.col("doc_id").alias("cluster_id"))
    return comps.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    ).unionByName(singles)


_MIX_RATES = {"en": 1.0, "fr": 0.5, "zh": 0.5, "es": 0.25, "de": 0.25}
_PACK_BUDGET = 512


_CHUNK_TOKENS = 32


@query(
    "sample_pack_pipeline",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
             len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS n_tokens
      FROM documents
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            / 4294967296.0
            < CASE lang WHEN 'en' THEN 1.0 WHEN 'fr' THEN 0.5 WHEN 'zh' THEN 0.5
                        WHEN 'es' THEN 0.25 WHEN 'de' THEN 0.25 ELSE 0.0 END
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CAST(ceil(n_tokens / 32.0) AS BIGINT)) AS BIGINT) AS n_chunks,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(0 AS BIGINT) AS n_bad_packs
    FROM s GROUP BY lang
    """,
)
def sample_pack_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full sample -> chunk -> pack preprocessing chain, oracle-checked
    end to end: keep a deterministic md5-hash stratified sample per
    language (exact binary rates, so the Spark filter and the DuckDB
    filter admit byte-identical row sets), split each sampled doc into
    <= 32-token chunks (map-only ``chunk_documents``), greedily pack the
    chunks into 512-token sequences (operators/sampling.py), and emit
    per-language conservation invariants computed from the PACK output:
    every sampled doc survives chunking+packing (n_docs, distinct),
    chunk count law n_chunks = sum(ceil(n_tokens/32)) (the r4 leg that
    puts chunk_documents under the driver's hash check), token mass
    preserved through chunk AND pack (total_tokens), and zero multi-chunk
    packs over budget (n_bad_packs). The oracle recomputes sample
    membership and the chunk/token arithmetic in SQL and states the
    packing invariants as constants — a lost or duplicated chunk, a
    token-splitting bug, or an overfilled pack each breaks a column."""
    from ..operators.sampling import (
        chunk_documents,
        hash_stratified_sample,
        pack_sequences,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    sampled = hash_stratified_sample(d, _MIX_RATES, "lang", "doc_id")
    chunks = chunk_documents(sampled, max_tokens=_CHUNK_TOKENS).select(
        (F.col("doc_id") * F.lit(1_000_000) + F.col("chunk_idx")).alias("chunk_id"),
        "n_tokens",
    )
    packed = pack_sequences(
        chunks,
        budget=_PACK_BUDGET,
        id_col="chunk_id",
        n_tokens_col="n_tokens",
        num_partitions=32,
    )
    fills = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("n_in_pack")
    )
    bad = fills.filter(
        (F.col("fill") > _PACK_BUDGET) & (F.col("n_in_pack") > 1)
    ).agg(F.count(F.lit(1)).alias("n_bad"))
    per_lang = (
        packed.select(
            F.expr("chunk_id div 1000000").alias("doc_id"),
            "n_tokens",
        )
        .join(sampled.select("doc_id", "lang"), on="doc_id")
        .groupBy("lang")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    return per_lang.crossJoin(bad).select(
        "lang", "n_docs", "n_chunks", "total_tokens", F.col("n_bad").alias("n_bad_packs")
    )


_LEAK_8GRAM = " ".join(f"zzleak{i}" for i in range(8))


def _zorder_oracle_expr(bits: int = 8) -> str:
    """DuckDB bit arithmetic reproducing ``layout.zorder_key`` over
    events(user_id, value) with ``bits``-wide buckets: the bucket mirrors
    Spark's width_bucket float operation ORDER exactly — (hi-lo)/n first,
    then (v-lo)/that, then floor — so IEEE doubles agree bit-for-bit and
    the Morton interleave is integer-exact (verified: 0 mismatches over
    the full events table)."""
    n_buckets = 1 << bits

    def bucket(col: str, lo: str, hi: str) -> str:
        return (
            f"least(greatest(CAST(floor((CAST({col} AS DOUBLE) - ({lo})) / "
            f"((({hi}) - ({lo})) / {n_buckets}.0)) AS BIGINT), 0), {n_buckets - 1})"
        )

    bu = bucket("user_id", "(SELECT min(user_id) FROM events)", "(SELECT max(user_id) FROM events)")
    bv = bucket("value", "(SELECT min(value) FROM events)", "(SELECT max(value) FROM events)")
    parts = []
    for b in range(bits):
        parts.append(f"(((({bu}) >> {b}) & 1) << {b * 2})")
        parts.append(f"(((({bv}) >> {b}) & 1) << {b * 2 + 1})")
    return " | ".join(parts)


#: (stat alias, micro-scaled Gopher threshold) in emission order — single
#: source of truth for the Spark leg AND the DuckDB oracle's pass flag.
_REPETITION_STATS = (
    ("dup_line_frac", 300000),
    ("dup_line_char_frac", 200000),
    ("dup_para_frac", 300000),
    ("dup_para_char_frac", 200000),
    ("top2gram_char_frac", 200000),
    ("top3gram_char_frac", 180000),
    ("top4gram_char_frac", 160000),
    ("dup5gram_char_frac", 150000),
    ("dup10gram_char_frac", 100000),
)


def _repetition_oracle_ctes() -> str:
    """DuckDB CTEs recomputing every ``gopher_repetition_columns`` stat in
    integer micro units (round(frac,6)*1e6) plus the conjunction pass
    flag, and the ``duplicate_span_stats`` coverage counts (span_n=8).
    Tokenization/line/paragraph splits mirror the Spark expressions
    exactly (same whitespace class, chr(10) lines, '\\n{{2,}}'
    paragraphs, whole-gram guards for docs shorter than n tokens)."""

    def micro(x: str) -> str:
        return f"CAST(round(round(({x}) + 1e-09, 6) * 1e6) AS BIGINT)"

    def cfrac(mass: str, nch: str) -> str:
        return micro(f"CASE WHEN {nch} > 0 THEN least(({mass}) / CAST({nch} AS DOUBLE), 1.0) ELSE 0.0 END")

    unit_stats = []
    for unit, arr in (("line", "ls"), ("para", "ps")):
        unit_stats.append(
            f"SELECT doc_id, 'dup_{unit}_frac' AS s1, "
            + micro(f"(len({arr}) - len(list_distinct({arr}))) / CAST(len({arr}) AS DOUBLE)")
            + " AS v FROM rep_docs"
        )
        unit_stats.append(
            f"""SELECT rd.doc_id, 'dup_{unit}_char_frac', {cfrac("coalesce(m.mass, 0)", "rd.nch")}
            FROM rep_docs rd LEFT JOIN (
              SELECT doc_id, sum((c - 1) * length(u)) AS mass FROM (
                SELECT doc_id, u, count(*) AS c
                FROM (SELECT doc_id, unnest({arr}) AS u FROM rep_docs) GROUP BY doc_id, u
              ) WHERE c >= 2 GROUP BY doc_id
            ) m ON rd.doc_id = m.doc_id"""
        )
    top_stats = [
        f"""SELECT rd.doc_id, 'top{n}gram_char_frac',
            {cfrac(f"coalesce(t.cnt * length(t.gram), 0)", "rd.nch")}
        FROM rep_docs rd LEFT JOIN (
          SELECT doc_id, cnt, gram FROM (
            SELECT doc_id, gram, cnt,
                   row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
            FROM repgc WHERE n = {n}
          ) WHERE rn = 1 AND cnt >= 2
        ) t ON rd.doc_id = t.doc_id"""
        for n in (2, 3, 4)
    ]
    dup_stats = [
        f"""SELECT rd.doc_id, 'dup{n}gram_char_frac', {cfrac("coalesce(m.mass, 0)", "rd.nch")}
        FROM rep_docs rd LEFT JOIN (
          SELECT doc_id, sum((cnt - 1) * length(gram)) AS mass
          FROM repgc WHERE n = {n} AND cnt >= 2 GROUP BY doc_id
        ) m ON rd.doc_id = m.doc_id"""
        for n in (5, 10)
    ]
    pass_checks = " AND ".join(
        f"max(CASE WHEN s1 = '{name}' THEN v END) <= {thr}" for name, thr in _REPETITION_STATS
    )
    all_stats = ",\n".join(f"s{i} AS ({s})" for i, s in enumerate(unit_stats + top_stats + dup_stats))
    union = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(len(unit_stats + top_stats + dup_stats)))
    return f"""
    rep_docs AS (
      SELECT doc_id, length(text) AS nch,
             CASE WHEN trim(text) = '' THEN ['']
                  ELSE string_split_regex(trim(text), '[ \\t\\n\\r\\f]+') END AS toks,
             string_split(text, chr(10)) AS ls,
             string_split_regex(text, '\\n{{2,}}') AS ps
      FROM documents
    ),
    repg AS (
      SELECT doc_id, n, gram FROM (
        SELECT doc_id, ns.n,
               CASE WHEN len(toks) >= ns.n
                    THEN list_transform(range(1, len(toks) - ns.n + 2),
                                        i -> array_to_string(toks[i:i+ns.n-1], ' '))
                    ELSE [] END AS gs
        FROM rep_docs, (SELECT unnest([2, 3, 4, 5, 10]) AS n) ns
      ), unnest(gs) AS u(gram)
    ),
    repgc AS (SELECT doc_id, n, gram, count(*) AS cnt FROM repg GROUP BY doc_id, n, gram),
    {all_stats},
    repstats AS ({union}),
    reppass AS (
      SELECT doc_id,
             CAST(CASE WHEN {pass_checks} THEN 1000000 ELSE 0 END AS BIGINT) AS v
      FROM repstats GROUP BY doc_id
    ),
    spg AS (
      SELECT doc_id, i AS pos, array_to_string(toks[i+1:i+8], ' ') AS gram
      FROM rep_docs,
           unnest(CASE WHEN len(toks) >= 8 THEN range(0, len(toks) - 8 + 1) ELSE [] END) AS u(i)
    ),
    spd AS (SELECT gram FROM spg GROUP BY gram HAVING count(*) >= 2),
    sph AS (SELECT doc_id, pos FROM spg WHERE gram IN (SELECT gram FROM spd)),
    spc AS (
      SELECT doc_id, count(DISTINCT p) AS ndup
      FROM sph, unnest(range(pos, pos + 8)) AS v(p) GROUP BY doc_id
    )"""


def _pagerank_oracle_ctes(n_iter: int = 3) -> str:
    """Chained-CTE unroll of the 'pagerank' leg: the deterministic
    user(e) → user(2e) event graph, degree table with sinks, uniform
    start, then ``n_iter`` damped iterations at d = 0.75 — each round a
    dangling-mass scalar, an in-mass aggregate, and the rank update with
    the IDENTICAL float operation order the Spark operator uses
    ((0.25/n + (0.75*m)/n) + 0.75*coalesce(im, 0); 0.25 and 0.75 are
    exact binary fractions, so decimal-literal parsing cannot diverge)."""
    parts = [
        """
    pre AS (SELECT a.user_id AS src, b.user_id AS dst
            FROM events a JOIN events b ON b.event_id = a.event_id * 2),
    prd AS (SELECT n.node, coalesce(d.deg, 0) AS deg FROM
            (SELECT DISTINCT node FROM
              (SELECT src AS node FROM pre UNION ALL SELECT dst FROM pre)) n
            LEFT JOIN (SELECT src AS node, count(*) AS deg FROM pre GROUP BY src) d
            ON n.node = d.node),
    prnn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM prd),
    pr0 AS (SELECT node, deg, 1.0 / n AS rank FROM prd, prnn)"""
    ]
    for i in range(1, n_iter + 1):
        p = i - 1
        parts.append(f"""
    prm{i} AS (SELECT coalesce(sum(rank), 0.0) AS m FROM pr{p} WHERE deg = 0),
    prc{i} AS (SELECT e.dst AS node, sum(r.rank / r.deg) AS im
               FROM pr{p} r JOIN pre e ON e.src = r.node
               WHERE r.deg > 0 GROUP BY e.dst),
    pr{i} AS (SELECT g.node, g.deg,
                     (0.25 / nn.n + 0.75 * dd.m / nn.n)
                     + 0.75 * coalesce(c.im, 0.0) AS rank
              FROM prd g LEFT JOIN prc{i} c ON g.node = c.node, prnn nn, prm{i} dd)""")
    return ",".join(parts)


@query(
    "llm_library_suite",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS token
      FROM documents
    ), freq AS (
      SELECT token, count(*) AS cnt FROM tok GROUP BY token
    ), tot AS (
      SELECT sum(cnt) AS n_total, count(*) AS n_vocab FROM freq
    ), src AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source
    ), srctot AS (
      SELECT sum(n) AS t FROM src
    ), raw AS (
      SELECT source, pow(CAST(n AS DOUBLE) / t, -0.5) AS r FROM src, srctot
    ), rates AS (
      SELECT source, round(r / (SELECT max(r) FROM raw), 6) AS rate FROM raw
    ),{_repetition_oracle_ctes()},
    bmtf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
    bmdl AS (SELECT doc_id, len(toks) AS dl FROM rep_docs),
    bmdf AS (SELECT token, count(*) AS df FROM bmtf GROUP BY token),
    bmst AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n_docs,
                    (SELECT CAST(sum(len(toks)) AS DOUBLE) FROM rep_docs) AS n_toks),
    bmq AS (SELECT DISTINCT query_id, term FROM
            (SELECT doc_id AS query_id, unnest(toks[1:4]) AS term
             FROM rep_docs WHERE doc_id % 100 = 0)),
    bmc AS (
      SELECT q.query_id, t.doc_id,
             CAST(round(
               round(ln(1.0 + (s.n_docs - dfr.df + 0.5) / (dfr.df + 0.5)) + 1e-09, 6)
               * (t.tf * (1.25 + 1.0))
               / (t.tf + 1.25 * ((1.0 - 0.75) + 0.75 * l.dl / (s.n_toks / s.n_docs)))
               * 1000000.0 + 1e-09) AS BIGINT) AS cm
      FROM bmtf t
      JOIN bmq q ON t.token = q.term
      JOIN bmdl l ON t.doc_id = l.doc_id
      JOIN bmdf dfr ON t.token = dfr.token, bmst s
    ),
    clsm AS (
      SELECT doc_id,
             CAST(round(sum(cnt * ((idx % 997 - 498) / CAST(1000.0 AS DOUBLE)))
                        * 1000000.0 + 1e-09) AS BIGINT) AS mm
      FROM (
        SELECT doc_id, idx, CAST(count(*) AS DOUBLE) AS cnt FROM (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 4096 AS idx
          FROM tok
        ) GROUP BY doc_id, idx
      ) GROUP BY doc_id
    ),{_pagerank_oracle_ctes(3)}
    SELECT 'vocab' AS leg,
           CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) - 1 AS BIGINT) AS key,
           token AS s1, cnt AS i1, CAST(NULL AS BIGINT) AS i2
    FROM freq
    UNION ALL
    SELECT 'encode', doc_id, CAST(NULL AS VARCHAR),
           CAST(len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS BIGINT),
           CAST(0 AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'decontam', doc_id, CAST(NULL AS VARCHAR),
           CAST(1 AS BIGINT), CAST(NULL AS BIGINT)
    FROM documents WHERE doc_id % 50 = 0
    UNION ALL
    SELECT 'mixrates', CAST(NULL AS BIGINT), d.source,
           count(*), CAST(NULL AS BIGINT)
    FROM documents d JOIN rates ON d.source = rates.source
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          / 4294967296.0 < rate
    GROUP BY d.source
    UNION ALL
    SELECT 'shuffle', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           (SELECT count(*) FROM documents), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'nll', tok.doc_id, CAST(NULL AS VARCHAR),
           count(*),
           CAST(round(avg(-ln((cnt + 1.0) / (n_total + n_vocab))) * 1e6) AS BIGINT)
    FROM tok JOIN freq USING (token), tot
    GROUP BY tok.doc_id
    UNION ALL
    SELECT 'zorder', event_id, CAST(NULL AS VARCHAR),
           {_zorder_oracle_expr(8)}, CAST(NULL AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'tfidf', t.doc_id, t.term, t.rank, t.score_micro FROM (
      WITH tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
      dft AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      nd AS (SELECT count(*) AS n_docs FROM documents)
      SELECT doc_id, token AS term,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY
                  CAST(round(tf * round(ln((1.0 + n_docs) / (1.0 + df)) + 1.0 + 1e-09, 6) * 1e6) AS BIGINT) DESC,
                  token) AS BIGINT) AS rank,
             CAST(round(tf * round(ln((1.0 + n_docs) / (1.0 + df)) + 1.0 + 1e-09, 6) * 1e6) AS BIGINT) AS score_micro
      FROM tf JOIN dft USING (token), nd
    ) t WHERE t.rank <= 3
    UNION ALL
    SELECT 'semdedup', vec_id, CAST(NULL AS VARCHAR),
           CAST(1 AS BIGINT), CAST(1 AS BIGINT)
    FROM embeddings
    WHERE list_sum(list_transform(embedding, x -> CAST(x*x AS DOUBLE))) > 0
    UNION ALL
    SELECT 'nll2', s.doc_id, CAST(NULL AS VARCHAR), s.n, s.m FROM (
      WITH bt AS (
        SELECT doc_id, toks[i-1] AS prev, toks[i] AS cur
        FROM rep_docs,
             unnest(CASE WHEN len(toks) >= 2 THEN range(2, len(toks) + 1)
                         ELSE [] END) AS u(i)
      ), bfr AS (SELECT prev, cur, count(*) AS bf FROM bt GROUP BY prev, cur),
      sc AS (
        SELECT bt.doc_id, -ln((bf + 1.0) / (f.cnt + tot.n_vocab)) AS nll
        FROM bt JOIN bfr USING (prev, cur) JOIN freq f ON f.token = bt.prev, tot
        UNION ALL
        SELECT rd.doc_id, -ln((f.cnt + 1.0) / (tot.n_total + tot.n_vocab))
        FROM rep_docs rd JOIN freq f ON f.token = rd.toks[1], tot
      )
      SELECT doc_id, count(*) AS n, CAST(round(avg(nll) * 1e6) AS BIGINT) AS m
      FROM sc GROUP BY doc_id
    ) s
    UNION ALL
    SELECT 'repetition', doc_id, s1, v, CAST(NULL AS BIGINT) FROM repstats
    UNION ALL
    SELECT 'repetition', doc_id, 'repetition_pass', v, CAST(NULL AS BIGINT) FROM reppass
    UNION ALL
    SELECT 'dupspans', rd.doc_id, CAST(NULL AS VARCHAR),
           CAST(len(rd.toks) AS BIGINT), CAST(coalesce(spc.ndup, 0) AS BIGINT)
    FROM rep_docs rd LEFT JOIN spc ON rd.doc_id = spc.doc_id
    UNION ALL
    SELECT 'boilerplate', r.doc_id, r.cleaned, r.n_kept, CAST(NULL AS BIGINT)
    FROM (
      WITH base AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
      ln AS (SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) AS pos
             FROM base),
      boiler AS (SELECT line FROM ln GROUP BY line HAVING count(DISTINCT doc_id) >= 2),
      kept AS (SELECT * FROM ln WHERE line NOT IN (SELECT line FROM boiler))
      SELECT d.doc_id,
             coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), '') AS cleaned,
             count(k.line) AS n_kept
      FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id
      GROUP BY d.doc_id
    ) r
    UNION ALL
    SELECT 'bm25', b.query_id, CAST(b.doc_id AS VARCHAR), b.score, b.rnk FROM (
      SELECT query_id, doc_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
      FROM (SELECT query_id, doc_id, sum(cm) AS score
            FROM bmc GROUP BY query_id, doc_id)
    ) b WHERE b.rnk <= 10
    UNION ALL
    SELECT 'classifier', doc_id, CAST(NULL AS VARCHAR), mm,
           CAST(CASE WHEN mm > 0 THEN 1 ELSE 0 END AS BIGINT)
    FROM clsm
    UNION ALL
    SELECT 'merge', m.event_id, CAST(NULL AS VARCHAR),
           CAST(round(m.v * 1000000.0 + 1e-09) AS BIGINT),
           CAST(m.user_id AS BIGINT)
    FROM (
      SELECT event_id, user_id,
             CASE WHEN event_id % 7 = 0 THEN value + 2000.0 ELSE value END AS v
      FROM events WHERE event_id % 10 <> 0
      UNION ALL
      SELECT event_id + 10000000, user_id, value + 5000.0
      FROM events WHERE event_id % 13 = 0
    ) m
    UNION ALL
    SELECT 'scd2', s.event_id, CAST(NULL AS VARCHAR),
           CAST(round(s.value * 1000000.0 + 1e-09) AS BIGINT),
           CAST(s.vf * 100 + coalesce(s.vt, 50) AS BIGINT)
    FROM (
      WITH scdch AS (
        SELECT event_id, user_id, value + 1000.0 AS value, 'U' AS op, 1 AS version
        FROM events WHERE event_id % 7 = 0
        UNION ALL
        SELECT event_id, user_id, value + 2000.0, 'U', 2
        FROM events WHERE event_id % 7 = 0
        UNION ALL
        SELECT event_id, user_id, value, 'D', 9
        FROM events WHERE event_id % 10 = 0
        UNION ALL
        SELECT event_id + 10000000, user_id, value + 5000.0, 'U', 1
        FROM events WHERE event_id % 13 = 0
      ),
      scdn AS (
        SELECT event_id, value, op, version,
               lead(version) OVER (PARTITION BY event_id
                                   ORDER BY version, op, user_id, value) AS next_v
        FROM scdch
      ),
      scdf AS (SELECT event_id, min(version) AS first_v FROM scdch GROUP BY event_id)
      SELECT e.event_id, e.value, CAST(-1 AS BIGINT) AS vf, f.first_v AS vt
      FROM events e LEFT JOIN scdf f ON e.event_id = f.event_id
      UNION ALL
      SELECT event_id, value, version, next_v FROM scdn WHERE op = 'U'
    ) s
    UNION ALL
    SELECT 'expect', CAST(NULL AS BIGINT), x.rule, x.nv,
           (SELECT count(*) FROM events)
    FROM (
      SELECT 'value_not_null' AS rule,
             count(*) FILTER (WHERE NOT coalesce(value IS NOT NULL, FALSE)) AS nv
      FROM events
      UNION ALL
      SELECT 'type_domain',
             count(*) FILTER (WHERE NOT coalesce(
               event_type IN ('view','click','purchase','signup','error'), FALSE))
      FROM events
      UNION ALL
      SELECT 'value_below_90',
             count(*) FILTER (WHERE NOT coalesce(value < 90, FALSE))
      FROM events
      UNION ALL
      SELECT 'user_nonneg',
             count(*) FILTER (WHERE NOT coalesce(user_id >= 0, FALSE))
      FROM events
      UNION ALL
      SELECT 'event_id_unique', count(*) - count(DISTINCT event_id) FROM events
    ) x
    UNION ALL
    SELECT 'editdist', p.a, CAST(p.b AS VARCHAR), p.d, CAST(NULL AS BIGINT)
    FROM (
      WITH ednm AS (SELECT doc_id, substring(text, 1, 12) AS s FROM documents)
      SELECT a.doc_id AS a, b.doc_id AS b,
             CAST(levenshtein(a.s, b.s) AS BIGINT) AS d
      FROM ednm a JOIN ednm b ON a.doc_id < b.doc_id
      WHERE levenshtein(a.s, b.s) <= 3
    ) p
    UNION ALL
    SELECT 'cohort', CAST(NULL AS BIGINT), CAST(c.cohort_date AS VARCHAR),
           c.day_offset, c.n
    FROM (
      WITH cfirst AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
                      FROM events GROUP BY user_id),
      cact AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
      SELECT f.cohort_date,
             CAST((a.d - f.cohort_date) AS BIGINT) AS day_offset,
             CAST(count(DISTINCT a.user_id) AS BIGINT) AS n
      FROM cact a JOIN cfirst f ON a.user_id = f.user_id
      GROUP BY f.cohort_date, (a.d - f.cohort_date)
    ) c
    UNION ALL
    SELECT 'funnel', fz.user_id, CAST(NULL AS VARCHAR), fz.stage,
           CAST(epoch_us(fz.tf) AS BIGINT)
    FROM (
      WITH fv AS (SELECT user_id, min(ts) AS t1 FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
      fc AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
             JOIN fv ON e.user_id = fv.user_id
             WHERE e.event_type = 'click' AND e.ts > fv.t1 GROUP BY e.user_id),
      fp AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
             JOIN fc ON e.user_id = fc.user_id
             WHERE e.event_type = 'purchase' AND e.ts > fc.t2 GROUP BY e.user_id)
      SELECT fv.user_id,
             CAST(CASE WHEN fp.t3 IS NOT NULL THEN 3
                       WHEN fc.t2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage,
             coalesce(fp.t3, fc.t2, fv.t1) AS tf
      FROM fv LEFT JOIN fc ON fv.user_id = fc.user_id
             LEFT JOIN fp ON fv.user_id = fp.user_id
    ) fz
    UNION ALL
    SELECT 'pagerank', node, CAST(NULL AS VARCHAR),
           CAST(round(rank * 1000000000.0 + 1e-09) AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM pr3
    UNION ALL
    SELECT 'jacjoin', jp.ia, CAST(jp.ib AS VARCHAR),
           CAST(round(jp.j * 1000000.0) AS BIGINT), CAST(NULL AS BIGINT)
    FROM (
      WITH jsh AS (
        SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id,
                 CASE WHEN len(toks) >= 3
                      THEN list_transform(range(1, len(toks) - 1),
                                          i -> array_to_string(toks[i:i+2], ' '))
                      ELSE [array_to_string(toks, ' ')] END AS gs
          FROM rep_docs
        ), unnest(gs) AS u(sh)
      ),
      jsz AS (SELECT doc_id, count(*) AS s FROM jsh GROUP BY doc_id),
      jint AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
        FROM jsh a JOIN jsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
      )
      SELECT ia, ib,
             round(inter / CAST(sa.s + sb.s - inter AS DOUBLE) + 1e-09, 6) AS j
      FROM jint JOIN jsz sa ON sa.doc_id = jint.ia JOIN jsz sb ON sb.doc_id = jint.ib
    ) jp WHERE jp.j >= 0.5
    UNION ALL
    SELECT 'entropy', e.doc_id, CAST(NULL AS VARCHAR),
           CAST(round(e.h * 1000000.0 + 1e-09) AS BIGINT), e.n
    FROM (
      SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n,
             CASE WHEN length(d.text) = 0 THEN 0.0
                  ELSE (ln(CAST(length(d.text) AS DOUBLE))
                        - coalesce(cs.s, 0.0) / CAST(length(d.text) AS DOUBLE))
                       / ln(2.0) END AS h
      FROM documents d LEFT JOIN (
        SELECT doc_id, sum(cnt * ln(cnt)) AS s FROM (
          SELECT doc_id, CAST(count(*) AS DOUBLE) AS cnt
          FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
          GROUP BY doc_id, ch
        ) GROUP BY doc_id
      ) cs ON d.doc_id = cs.doc_id
    ) e
    UNION ALL
    SELECT 'triangles', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), t.cnt,
           CAST(NULL AS BIGINT)
    FROM (
      WITH tce AS (
        SELECT DISTINCT least(a.user_id, b.user_id) AS u,
                        greatest(a.user_id, b.user_id) AS v
        FROM events a JOIN events b ON b.event_id = a.event_id * 2
        WHERE a.user_id <> b.user_id
      )
      SELECT CAST(count(*) AS BIGINT) AS cnt
      FROM tce e1 JOIN tce e2 ON e2.u = e1.u AND e2.v > e1.v
           JOIN tce e3 ON e3.u = e1.v AND e3.v = e2.v
    ) t
    UNION ALL
    SELECT 'wsample', doc_id, CAST(NULL AS VARCHAR), rnk, CAST(NULL AS BIGINT)
    FROM (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY
               pow((CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 8))
                             AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0,
                   1.0 / CAST(n_chars AS DOUBLE)) DESC,
               doc_id) AS BIGINT) AS rnk
      FROM documents
      WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0
    ) WHERE rnk <= 100
    """,
)
def llm_library_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Twenty-six library operators in one driver slot (r4, widened r5;
    tagged legs, the scalar_semantics_suite pattern):

    'vocab' — the FULL build_vocab output (token, count, token_id): the
    oracle recomputes frequencies AND the dense frequency-ranked ids with
    row_number() OVER (ORDER BY count DESC, token ASC) - 1, so the
    range-partitioned two-job id assignment is value-checked end to end,
    dense 0..V-1 with deterministic tie-breaks.

    'encode' — encode_documents roundtrip per document: i1 = n_tokens from
    the ENCODED output (must equal the SQL token count), i2 = unk count +
    decode-mismatch flag (token_ids joined back through the vocabulary and
    order-restored must reproduce tokens(text) exactly; the corpus's own
    vocab has no OOV, so the oracle states 0).

    'decontam' — planted-leak invariant for decontaminate: an 8-token
    marker ngram (absent from the corpus) is appended to every doc with
    doc_id % 50 == 0 and used as the benchmark set; exactly those docs
    must be flagged, each with exactly one contaminated shingle.

    'mixrates' — temperature_mix_rates(T=2) + hash_stratified_sample on
    the source column: the oracle recomputes the tempered keep rates
    ((p_s)^(1/T-1), peak-normalized, rounded 6dp on BOTH engines so libm
    pow differences cannot move the filter threshold) and replays the md5
    membership filter — per-source kept counts must match exactly.

    'shuffle' — shuffle_deterministic layout-independence: the same seed
    applied to two differently-partitioned inputs must give every doc the
    same shard (i2 = mismatch count, stated 0 by the oracle), with the
    full corpus present (i1).

    'nll' — unigram_nll_scores value check: the oracle recomputes the
    add-one-smoothed corpus unigram NLL per document; avg_nll is compared
    in integer micro-nats (both engines round(avg*1e6)) so float
    summation-order noise (~1e-8 relative) cannot flip the hash.

    'zorder' — layout.zorder_key value check over events(user_id, value):
    the oracle reproduces the width_bucket quantization (mirroring Spark's
    float operation order exactly, so IEEE doubles agree) and the Morton
    bit interleave — the clustering key that drives write_zordered's
    multi-dimensional data skipping is hash-checked value-for-value; the
    write path + footer-stats skipping stay pinned by test_layout.py.

    'boilerplate' — remove_boilerplate_lines value check: the cleaned text
    and surviving line count per document compared byte-for-byte against
    the SQL recomputation (driver docs are single-line, so the leg
    degenerates to whole-doc frequency — duplicate docs get emptied; the
    multi-line mechanics are pinned by test_llm_ops.py).

    'tfidf' (r5) — tfidf_top_terms value check: top-3 smoothed TF-IDF
    terms per document, scores compared in exact integer micro-units
    (tf * round(idf, 6) * 1e6 is an exactly-representable integer, so the
    cross-engine compare is bit-stable) and ranks fully ordered by
    (score DESC, term ASC).

    'semdedup' (r5) — planted-copy invariant for semantic_dedup
    (SemDeDup): an exact copy of every nonzero embedding is planted at
    id + 1e6; identical floats assign to the identical k-means cluster and
    tie on centroid similarity, so the smaller id (the original) must be
    kept (i1 = 1) and the copy dropped (i2 = 1) for EVERY vector — the
    oracle states both flags directly. The discriminative behavior
    (perturbed chains, representative choice, zero-norm guard) is pinned
    by tests/test_semdedup_tfidf.py.

    'repetition' (r5) — gopher_repetition_columns value check: all nine
    Gopher repetition fractions (dup line/para counts and chars, top
    2/3/4-gram char coverage, dup 5/10-gram excess char mass) PLUS the
    conjunction pass flag, one row per (doc, stat), compared in integer
    micro units; the oracle recomputes every stat from raw SQL splits
    and re-derives the pass flag from the same micro values, so the
    zero-shuffle sorted-run aggregates are checked value-for-value.

    'dupspans' (r5) — duplicate_span_stats (exact-substring dedup, Lee
    et al. 2021 shape) value check: per-doc token counts and the number
    of token positions covered by any corpus-duplicated 8-gram; the
    oracle recomputes coverage from positions with plain SQL grouping
    (the Spark side travels as 128-bit gram hashes — a hash-vs-string
    divergence would break the hash match).

    'nll2' (r5) — bigram_nll_scores value check: add-one-smoothed
    corpus bigram NLL per document (unigram-scored first token), the
    KenLM-shaped CCNet perplexity filter; compared in integer
    micro-nats like the unigram 'nll' leg, with the oracle building
    bigrams from token-array positions in plain SQL.

    'bm25' (r5) — bm25_top_docs value check: top-10 docs per query
    (queries = first 4 tokens of every doc_id % 100 == 0 document) with
    k1=1.25/b=0.75 so every derived constant is an exact binary
    fraction; per-term contributions round to integer micro-units
    BEFORE summing (order-independent), and the oracle recomputes tf,
    df, dl, avgdl, the Robertson idf, and the saturation formula with
    the identical operation order — scores and ranks match exactly.

    'classifier' (r5) — hashed-feature linear scoring value check: the
    hashing-trick feature index (portable md5 arithmetic, the mixrates
    pattern) and the margin aggregation scored under closed-form
    weights w(idx) = (idx % 997 - 498)/1000; margins compared in
    integer micro-units, predicted labels derived from the SAME
    rounded value in both engines. Training (distributed batch GD) is
    pinned by numpy-parity pytest, not SQL.

    'merge' (r5) — apply_changes (CDC latest-wins merge) value check:
    a synthesized delta over events (two versioned upserts on %7 keys,
    a higher-versioned delete on %10 keys, pure inserts on fresh %13
    keys) merged against the snapshot; the oracle states the closed
    form (deletes gone, version-2 value on surviving %7 keys, inserts
    present, everything else untouched) row for row.

    'scd2' (r5) — scd2_apply (Type-2 history) value check: the SAME
    delta as 'merge' applied to a version--1 seeded history; EVERY
    interval row (closed originals, superseded upserts, resurrections,
    open currents) is stated by the oracle via lead()-window interval
    assembly, with (valid_from, valid_to) encoded into one integer.

    'wsample' (r5) — weighted_sample (Efraimidis-Spirakis A-ES without
    replacement) value check: top-100 documents by u^(1/n_chars) keys
    from the portable md5-uniform; the oracle recomputes every key and
    restates the full rank permutation.

    'jacjoin' (r5) — jaccard_join_prefix (exact All-Pairs prefix-
    filtered similarity join) value check: the oracle computes the FULL
    brute-force 3-gram Jaccard pair set at threshold 0.5 — a missed
    pair (lost prefix completeness) or an extra pair fails the hash;
    jaccard values compared in integer micro-units.

    'entropy' (r5) — char_entropy value check: Shannon bits/char from
    the zero-shuffle sorted-run fold, compared in integer micro-units
    against the oracle's unnest-groupBy recomputation (the fold's
    sorted-order float summation vs SQL group order differs only at
    ULP scale).

    'expect' (r5) — expectation_report (Deequ-lite) value check: four
    fused predicate rules + one exact uniqueness rule over events, the
    oracle restating each rule's violation count with FILTER clauses.

    'editdist' (r5) — edit_distance_join value check: every pair of
    12-char document prefixes within 3 edits, from the lossless
    q-gram + length-window candidate union; the oracle brute-forces
    all pairs with DuckDB's levenshtein — a missed pair fails the hash.

    'cohort' (r5) — cohort_retention value check: daily first-activity
    cohorts x day offsets with distinct-user counts, restated by the
    oracle from CAST(ts AS DATE) arithmetic (the UTC session pin makes
    calendar dates engine-identical).

    'funnel' (r5) — funnel_stages value check: the greedy-earliest
    view→click→purchase chain per user (each stage the min event time
    STRICTLY after the previous stage's), stage reached + completion
    instant in epoch micros, all restated by the oracle via chained
    conditional-min CTEs.

    'triangles' (r5) — triangle_count value check: the degree-ordered
    node-iterator count over the same event graph, vs the oracle's
    canonical u<v<w triple join.

    'pagerank' (r5) — pagerank value check: 3 damped power iterations
    (d = 0.75, so 1-d is an exact binary fraction) over the
    deterministic user-of-event-e → user-of-event-2e link graph,
    including the dangling-mass redistribution term; the oracle unrolls
    the identical three iterations as chained CTEs with the identical
    float operation order, ranks compared in integer nano-units."""
    legs = _library_suite_legs(spark, sf_dir)
    out = legs["vocab"]
    for name in (
        "encode", "decontam", "mixrates", "shuffle", "nll", "zorder",
        "boilerplate", "tfidf", "semdedup", "repetition", "dupspans", "nll2",
        "bm25", "classifier", "merge", "scd2", "pagerank", "wsample",
        "entropy", "jacjoin", "funnel", "expect", "cohort", "editdist",
        "triangles",
    ):
        out = out.unionByName(legs[name])
    return out


def _library_suite_legs(spark: SparkSession, sf_dir: str):
    """The twenty-six ``llm_library_suite`` legs as individually-runnable
    DataFrames (diagnosability: the driver gate hashes the union, so a
    failure there names the suite — ``tests/test_catalog_extra.py::
    test_llm_library_suite_legs_individually`` runs each leg alone so the
    first broken leg is named)."""
    from ..operators.sampling import (
        hash_stratified_sample,
        shuffle_deterministic,
        temperature_mix_rates,
        unigram_nll_scores,
    )
    from ..operators.vocab import build_vocab, encode_documents

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    vocab = build_vocab(d)
    vocab_leg = vocab.select(
        F.lit("vocab").alias("leg"),
        F.col("token_id").alias("key"),
        F.col("token").alias("s1"),
        F.col("count").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    enc = encode_documents(d, vocab)
    ids = enc.select("doc_id", F.posexplode("token_ids").alias("pos", "token_id"))
    decoded = (
        ids.join(vocab.select("token_id", "token"), on="token_id", how="left")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda s: s["token"],
            ).alias("decoded")
        )
    )
    orig = d.select("doc_id", tokens(F.col("text")).alias("orig"))
    encode_leg = (
        enc.join(decoded, "doc_id")
        .join(orig, "doc_id")
        .select(
            F.lit("encode").alias("leg"),
            F.col("doc_id").alias("key"),
            F.lit(None).cast("string").alias("s1"),
            F.col("n_tokens").cast("long").alias("i1"),
            (
                F.size(F.filter(F.col("token_ids"), lambda x: x == F.lit(-1)))
                + F.when(F.col("decoded") == F.col("orig"), F.lit(0)).otherwise(F.lit(1))
            ).cast("long").alias("i2"),
        )
    )

    planted = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 50 == 0,
            F.concat_ws(" ", F.col("text"), F.lit(_LEAK_8GRAM)),
        ).otherwise(F.col("text")).alias("text"),
    )
    benchmark = spark.createDataFrame([(_LEAK_8GRAM,)], ["text"])
    decontam_leg = decontaminate(planted, benchmark, shingle_n=8).select(
        F.lit("decontam").alias("leg"),
        F.col("doc_id").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.col("n_contaminated_shingles").cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    ds = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    rates = {
        k: round(v, 6)
        for k, v in temperature_mix_rates(ds, "source", temperature=2.0).items()
    }
    mix_leg = (
        hash_stratified_sample(ds, rates, "source", "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .select(
            F.lit("mixrates").alias("leg"),
            F.lit(None).cast("long").alias("key"),
            F.col("source").alias("s1"),
            F.col("n_kept").alias("i1"),
            F.lit(None).cast("long").alias("i2"),
        )
    )

    shuf_a = shuffle_deterministic(
        ds.repartition(5), seed=7, num_partitions=8
    ).select("doc_id", F.spark_partition_id().alias("pa"))
    shuf_b = shuffle_deterministic(
        ds.repartition(13, "source"), seed=7, num_partitions=8
    ).select("doc_id", F.spark_partition_id().alias("pb"))
    shuffle_leg = (
        shuf_a.join(shuf_b, on="doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("pa") != F.col("pb")).cast("long")).alias("n_mismatch"),
        )
        .select(
            F.lit("shuffle").alias("leg"),
            F.lit(None).cast("long").alias("key"),
            F.lit(None).cast("string").alias("s1"),
            F.col("n").alias("i1"),
            F.col("n_mismatch").alias("i2"),
        )
    )

    nll_leg = unigram_nll_scores(d).select(
        F.lit("nll").alias("leg"),
        F.col("doc_id").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.col("n_tokens").alias("i1"),
        F.round(F.col("avg_nll") * 1e6, 0).cast("long").alias("i2"),
    )

    from ..operators.layout import zorder_key

    ev = load_table(spark, sf_dir, "events")
    zorder_leg = ev.select(
        F.lit("zorder").alias("leg"),
        F.col("event_id").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        zorder_key(ev, ["user_id", "value"], bits=8).alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    from ..operators.dedup import remove_boilerplate_lines

    boiler_leg = remove_boilerplate_lines(d).select(
        F.lit("boilerplate").alias("leg"),
        F.col("doc_id").alias("key"),
        F.col("text").alias("s1"),
        F.col("n_kept_lines").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    from ..operators.tfidf import tfidf_top_terms

    tfidf_leg = tfidf_top_terms(d, k=3).select(
        F.lit("tfidf").alias("leg"),
        F.col("doc_id").alias("key"),
        F.col("term").alias("s1"),
        F.col("rank").cast("long").alias("i1"),
        F.col("score_micro").alias("i2"),
    )

    from ..operators.dedup import semantic_dedup

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    norm2 = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    eligible = e.filter(norm2 > 0)
    sd = semantic_dedup(
        eligible.unionByName(
            eligible.select((F.col("vec_id") + F.lit(1000000)).alias("vec_id"), "embedding")
        ),
        threshold=0.95,
    )
    flags = sd.select("vec_id", F.col("keep").cast("long").alias("k"))
    semdedup_leg = (
        flags.filter(F.col("vec_id") < 1000000)
        .join(
            flags.filter(F.col("vec_id") >= 1000000).select(
                (F.col("vec_id") - 1000000).alias("vec_id"),
                (F.lit(1) - F.col("k")).cast("long").alias("dropped"),
            ),
            "vec_id",
        )
        .select(
            F.lit("semdedup").alias("leg"),
            F.col("vec_id").alias("key"),
            F.lit(None).cast("string").alias("s1"),
            F.col("k").alias("i1"),
            F.col("dropped").alias("i2"),
        )
    )

    from ..functions.text import gopher_repetition_columns

    rep_wide = d.select("doc_id", *gopher_repetition_columns(F.col("text")))
    stat_names = [name for name, _ in _REPETITION_STATS] + ["repetition_pass"]
    rep_leg = (
        rep_wide.select(
            "doc_id", *[F.col(s).cast("double").alias(s) for s in stat_names]
        )
        .unpivot("doc_id", stat_names, "s1", "frac")
        .select(
            F.lit("repetition").alias("leg"),
            F.col("doc_id").alias("key"),
            F.col("s1"),
            F.round(F.col("frac") * 1e6, 0).cast("long").alias("i1"),
            F.lit(None).cast("long").alias("i2"),
        )
    )

    from ..operators.sampling import bigram_nll_scores

    nll2_leg = bigram_nll_scores(d).select(
        F.lit("nll2").alias("leg"),
        F.col("doc_id").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.col("n_tokens").alias("i1"),
        F.round(F.col("avg_nll") * 1e6, 0).cast("long").alias("i2"),
    )

    from ..operators.dedup import duplicate_span_stats

    dupspan_leg = duplicate_span_stats(d, span_n=8).select(
        F.lit("dupspans").alias("leg"),
        F.col("doc_id").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.col("n_tokens").alias("i1"),
        F.col("n_dup_tokens").alias("i2"),
    )

    from ..operators.tfidf import bm25_top_docs

    # k1=1.25 (not the 1.2 API default): every derived constant (k1+1 =
    # 2.25, 1-b = 0.25) is then an EXACT binary fraction, so the oracle's
    # decimal literals convert to the identical doubles Spark's Python
    # literals do — no cross-engine representation slop in the score math.
    bm_queries = d.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens(F.col("text")), 1, 4), " ").alias("text"),
    )
    bm25_leg = bm25_top_docs(d, bm_queries, k=10, k1=1.25, b=0.75).select(
        F.lit("bm25").alias("leg"),
        F.col("query_id").alias("key"),
        F.col("doc_id").cast("string").alias("s1"),
        F.col("score_micro").alias("i1"),
        F.col("rank").cast("long").alias("i2"),
    )

    from ..operators.classifier import hashed_features, linear_margin

    # closed-form weights w(idx) = (idx % 997 - 498)/1000 exercise the
    # REAL scoring path (hash -> pool -> weight join -> margin agg) while
    # staying SQL-restatable; the learned-weight path is pinned by
    # tests/test_classifier_bm25.py (numpy GD parity). i1/i2 derive from
    # the SAME rounded micro value so the sign bit cannot diverge on a
    # mathematically-zero margin.
    feats = hashed_features(d, n_features=4096)
    cls_weights = feats.select("idx").distinct().withColumn(
        "w", ((F.col("idx") % 997) - 498) / F.lit(1000.0)
    )
    _mm = F.round(F.col("margin") * 1000000.0 + F.lit(1e-9)).cast("long")
    classifier_leg = linear_margin(feats, cls_weights).select(
        F.lit("classifier").alias("leg"),
        F.col("doc_id").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        _mm.alias("i1"),
        (_mm > 0).cast("long").alias("i2"),
    )

    from ..operators.merge import OP_DELETE, OP_UPSERT, apply_changes

    mev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    _mu = lambda df, add, ver: df.select(  # noqa: E731
        "event_id", "user_id",
        (F.col("value") + F.lit(float(add))).alias("value"),
        F.lit(OP_UPSERT).alias("op"), F.lit(ver).alias("version"),
    )
    sevens = mev.filter(F.col("event_id") % 7 == 0)
    delta = (
        _mu(sevens, 1000, 1)
        .unionByName(_mu(sevens, 2000, 2))  # version 2 must win over 1
        .unionByName(
            mev.filter(F.col("event_id") % 10 == 0).select(
                "event_id", "user_id", "value",
                F.lit(OP_DELETE).alias("op"), F.lit(9).alias("version"),
            )  # version 9: delete beats both upserts on %70 ids
        )
        .unionByName(
            mev.filter(F.col("event_id") % 13 == 0).select(
                (F.col("event_id") + 10000000).alias("event_id"), "user_id",
                (F.col("value") + F.lit(5000.0)).alias("value"),
                F.lit(OP_UPSERT).alias("op"), F.lit(1).alias("version"),
            )  # fresh keys: pure inserts
        )
    )
    merge_leg = apply_changes(mev, delta, ["event_id"]).select(
        F.lit("merge").alias("leg"),
        F.col("event_id").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.round(F.col("value") * 1000000.0 + F.lit(1e-9)).cast("long").alias("i1"),
        F.col("user_id").cast("long").alias("i2"),
    )

    from ..operators.merge import scd2_apply, scd2_init

    # the SAME delta applied as SCD Type-2 history: every superseded
    # interval stays, encoded into i2 as valid_from*100 + valid_to
    # (50 = open interval; versions here are -1/1/2/9, so the encoding
    # is collision-free integer arithmetic on both engines)
    scd = scd2_apply(scd2_init(mev, -1), delta, ["event_id"])
    scd2_leg = scd.select(
        F.lit("scd2").alias("leg"),
        F.col("event_id").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.round(F.col("value") * 1000000.0 + F.lit(1e-9)).cast("long").alias("i1"),
        (
            F.col("valid_from") * 100 + F.coalesce(F.col("valid_to"), F.lit(50))
        ).cast("long").alias("i2"),
    )

    from ..operators.dedup import jaccard_join_prefix

    # string-shingle mode: heavier shuffles than the production xxhash64
    # path, but zero collision surface and every value SQL-restatable —
    # the oracle recomputes the FULL exact pair set by brute force
    jac_leg = jaccard_join_prefix(d, threshold=0.5, hash_shingles=False).select(
        F.lit("jacjoin").alias("leg"),
        F.col("id_a").alias("key"),
        F.col("id_b").cast("string").alias("s1"),
        F.round(F.col("jaccard") * 1000000.0).cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    from ..functions.text import char_entropy

    entropy_leg = d.select(
        F.lit("entropy").alias("leg"),
        F.col("doc_id").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.round(char_entropy(F.col("text")) * 1000000.0 + F.lit(1e-9))
        .cast("long")
        .alias("i1"),
        F.length("text").cast("long").alias("i2"),
    )

    from ..operators.sampling import weighted_sample

    # A-ES weighted sample of documents by n_chars: the selected set AND
    # the full rank permutation are pure functions of (doc_id, seed, w),
    # so the oracle restates both (pow() cross-engine ULP noise cannot
    # reorder ranks — adjacent A-ES keys on 500 docs are ~1e-3 apart)
    dw = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    wsample_leg = weighted_sample(dw, "n_chars", k=100, seed=7).select(
        F.lit("wsample").alias("leg"),
        F.col("doc_id").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.col("sample_rank").cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    from ..operators.expectations import expectation_report

    _EXPECT_RULES = {
        "value_not_null": "value IS NOT NULL",
        "type_domain": "event_type IN ('view','click','purchase','signup','error')",
        "value_below_90": "value < 90",
        "user_nonneg": "user_id >= 0",
    }
    expect_leg = expectation_report(
        ev, _EXPECT_RULES, unique_keys={"event_id_unique": ["event_id"]}
    ).select(
        F.lit("expect").alias("leg"),
        F.lit(None).cast("long").alias("key"),
        F.col("rule").alias("s1"),
        F.col("n_violations").alias("i1"),
        F.col("n_rows").alias("i2"),
    )

    from ..operators.funnel import funnel_stages

    funnel_leg = funnel_stages(ev, ["view", "click", "purchase"]).select(
        F.lit("funnel").alias("leg"),
        F.col("user_id").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.col("stage_reached").cast("long").alias("i1"),
        F.unix_micros("t_final").alias("i2"),
    )

    from ..operators.linkage import edit_distance_join

    # 12-char document prefixes as the "name" column: short strings with
    # heavy overlap — both candidate paths (q-gram AND length-window)
    # exercise; the oracle brute-forces all pairs with DuckDB's own
    # levenshtein (identical unit-cost definition)
    ed_names = d.select("doc_id", F.substring("text", 1, 12).alias("name"))
    editdist_leg = edit_distance_join(ed_names, k=3).select(
        F.lit("editdist").alias("leg"),
        F.col("id_a").alias("key"),
        F.col("id_b").cast("string").alias("s1"),
        F.col("distance").cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    from ..operators.funnel import cohort_retention

    cohort_leg = cohort_retention(ev).select(
        F.lit("cohort").alias("leg"),
        F.lit(None).cast("long").alias("key"),
        F.col("cohort_date").cast("string").alias("s1"),
        F.col("day_offset").cast("long").alias("i1"),
        F.col("n_users").alias("i2"),
    )

    from ..operators.graph import pagerank

    # deterministic synthetic link graph over events: user of event e
    # links to the user of event 2e (parallel edges allowed; sinks —
    # users never on the src side — exercise the dangling-mass term)
    ea = ev.select(F.col("event_id").alias("eid"), F.col("user_id").alias("src"))
    eb = ev.select(F.col("event_id").alias("eid2"), F.col("user_id").alias("dst"))
    pr_edges = ea.join(eb, F.col("eid2") == F.col("eid") * 2).select("src", "dst")
    # damping 0.75 (not the 0.85 default): 1-d = 0.25 is an exact binary
    # fraction, so the oracle's decimal literals are the identical doubles
    from ..operators.graph import triangle_count

    triangle_leg = triangle_count(pr_edges).select(
        F.lit("triangles").alias("leg"),
        F.lit(None).cast("long").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.col("n_triangles").cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    pagerank_leg = pagerank(pr_edges, n_iter=3, damping=0.75).select(
        F.lit("pagerank").alias("leg"),
        F.col("node").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.round(F.col("rank") * 1000000000.0 + F.lit(1e-9)).cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    return {
        "vocab": vocab_leg,
        "encode": encode_leg,
        "decontam": decontam_leg,
        "mixrates": mix_leg,
        "shuffle": shuffle_leg,
        "nll": nll_leg,
        "zorder": zorder_leg,
        "boilerplate": boiler_leg,
        "tfidf": tfidf_leg,
        "semdedup": semdedup_leg,
        "repetition": rep_leg,
        "dupspans": dupspan_leg,
        "nll2": nll2_leg,
        "bm25": bm25_leg,
        "classifier": classifier_leg,
        "merge": merge_leg,
        "scd2": scd2_leg,
        "pagerank": pagerank_leg,
        "wsample": wsample_leg,
        "entropy": entropy_leg,
        "jacjoin": jac_leg,
        "funnel": funnel_leg,
        "expect": expect_leg,
        "cohort": cohort_leg,
        "editdist": editdist_leg,
        "triangles": triangle_leg,
    }
