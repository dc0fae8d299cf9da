from .weather import (
    parse_weather,
    parse_hotels,
    weather_rekey,
    hotels_rekey,
    weather_daily_avg,
    weather_by_geohash,
    enrich_hotels,
    weather_hotels_pipeline,
    latest_per_key,
)

# training-data pipeline surface (beyond-reference mandate)
from .bpe import (
    bpe_encode,
    bpe_train,
    word_frequencies,
)
from .cluster import (
    connected_components,
    dedup_survivors_by_cluster,
    dup_clusters,
)
from .dedup import (
    decontaminate,
    dedup_exact,
    drop_exact_duplicates,
    duplicate_span_stats,
    remove_boilerplate_lines,
    embedding_near_dup_pairs,
    minhash_lsh_candidates,
    drop_semantic_duplicates,
    ngram_jaccard_pairs,
    semantic_dedup,
    simhash_near_dup_pairs,
)
from .layout import (
    column_stats,
    compact_small_files,
    write_zordered,
    zorder_key,
)
from .multimodal import (
    attach_asset_meta,
    decode_image_features,
    extract_audio_features,
    resize_images,
    sample_video_frames,
)
from .sampling import (
    chunk_documents,
    hash_stratified_sample,
    pack_sequences,
    shuffle_deterministic,
    temperature_mix_rates,
    unigram_nll_scores,
)
from .tfidf import (
    tfidf_top_terms,
)
from .similarity import (
    kmeans_fit_distributed,
    knn_bruteforce,
    knn_ivf,
    knn_ivf_pq,
    malformed_vector_accumulator,
    knn_lsh,
)
from .vocab import build_vocab, build_vocab_with_cleanup, encode_documents

__all__ = [
    "parse_weather",
    "parse_hotels",
    "weather_rekey",
    "hotels_rekey",
    "weather_daily_avg",
    "weather_by_geohash",
    "enrich_hotels",
    "weather_hotels_pipeline",
    "latest_per_key",
    "connected_components",
    "dup_clusters",
    "dedup_survivors_by_cluster",
    "dedup_exact",
    "drop_exact_duplicates",
    "minhash_lsh_candidates",
    "bpe_train",
    "bpe_encode",
    "word_frequencies",
    "simhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "remove_boilerplate_lines",
    "drop_semantic_duplicates",
    "semantic_dedup",
    "duplicate_span_stats",
    "tfidf_top_terms",
    "embedding_near_dup_pairs",
    "decontaminate",
    "attach_asset_meta",
    "decode_image_features",
    "resize_images",
    "sample_video_frames",
    "extract_audio_features",
    "zorder_key",
    "write_zordered",
    "column_stats",
    "compact_small_files",
    "hash_stratified_sample",
    "chunk_documents",
    "pack_sequences",
    "shuffle_deterministic",
    "temperature_mix_rates",
    "unigram_nll_scores",
    "build_vocab",
    "build_vocab_with_cleanup",
    "encode_documents",
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivf",
    "knn_ivf_pq",
    "malformed_vector_accumulator",
    "kmeans_fit_distributed",
]
