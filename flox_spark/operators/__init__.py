from flox_spark.operators.text import (
    annotate_quality_filter,
    quality_filter,
    quality_filter_report,
    with_tokens,
    token_count,
    token_count_bpe,
    quality_score,
    language_id,
    fingerprint,
    ngram_counts,
    tfidf_top_terms,
)
from flox_spark.operators.dedup import (
    band_buckets,
    dedup_against,
    dedup_clusters,
    dedup_exact,
    dedup_keep_representatives,
    levenshtein_refine,
    minhash_against,
    fuzzy_join,
    minhash_jaccard_estimate,
    minhash_signatures,
    minhash_candidates,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)
from flox_spark.operators.diff import table_diff
from flox_spark.operators.scd import scd2_history
from flox_spark.operators.sharding import assign_shards, shard_stats, write_shards
from flox_spark.operators.asof import asof_join
from flox_spark.operators.clean import (
    contamination_report,
    decontaminate,
    dedup_lines,
    k_anonymity_report,
    normalize_whitespace,
    redact_pii,
    remove_boilerplate_lines,
)
from flox_spark.operators.funnel import funnel_conversion, funnel_path
from flox_spark.operators.kmeans import (
    assign_clusters,
    assign_clusters_two_level,
    kmeans_fit,
)
from flox_spark.operators.encode import frequency_encode, label_encode
from flox_spark.operators.lm import doc_perplexity, perplexity_filter, train_bigram_lm
from flox_spark.operators.similarity import semantic_dedup, semantic_dedup_pairs
from flox_spark.operators.packing import pack_sequences
from flox_spark.operators.pipeline import ann_recall, curate_corpus, dedup_documents
from flox_spark.operators.topk import grouped_topk
from flox_spark.operators.sampling import (
    sample_bernoulli,
    sample_exact_per_group,
    sample_exact_global,
    sample_mixture,
    sample_to_token_budget,
    split_by_group,
    sample_stratified,
    sample_weighted_per_group,
    split_train_test,
)
from flox_spark.operators.chunking import average_embeddings, chunk_documents
from flox_spark.operators.profile import profile_columns
from flox_spark.operators.rangejoin import range_join
from flox_spark.operators.sketches import (
    build_distinct_sketches,
    heavy_hitters,
    rollup_distinct,
)
from flox_spark.operators.sessions import (
    sessionize,
    session_stats,
)
from flox_spark.operators.similarity import (
    cosine_topk,
    lsh_bucket_candidates,
    embedding_near_duplicates,
    ivf_centroids,
    ivf_topk,
    normalize_embeddings,
    quantize_embeddings_int8,
)

__all__ = [
    "with_tokens",
    "token_count",
    "token_count_bpe",
    "quality_score",
    "annotate_quality_filter",
    "quality_filter",
    "quality_filter_report",
    "language_id",
    "fingerprint",
    "dedup_clusters",
    "dedup_exact",
    "dedup_keep_representatives",
    "fuzzy_join",
    "minhash_jaccard_estimate",
    "minhash_signatures",
    "minhash_candidates",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "simhash_signatures",
    "ann_recall",
    "curate_corpus",
    "asof_join",
    "assign_clusters",
    "assign_clusters_two_level",
    "dedup_documents",
    "funnel_conversion",
    "funnel_path",
    "grouped_topk",
    "kmeans_fit",
    "doc_perplexity",
    "perplexity_filter",
    "train_bigram_lm",
    "frequency_encode",
    "label_encode",
    "semantic_dedup",
    "semantic_dedup_pairs",
    "normalize_whitespace",
    "contamination_report",
    "decontaminate",
    "redact_pii",
    "remove_boilerplate_lines",
    "pack_sequences",
    "sample_bernoulli",
    "sample_exact_per_group",
    "sample_exact_global",
    "sample_mixture",
    "sample_to_token_budget",
    "split_by_group",
    "sample_stratified",
    "sample_weighted_per_group",
    "split_train_test",
    "sessionize",
    "session_stats",
    "cosine_topk",
    "lsh_bucket_candidates",
    "embedding_near_duplicates",
    "ivf_centroids",
    "ivf_topk",
    "normalize_embeddings",
    "quantize_embeddings_int8",
    "range_join",
    "profile_columns",
    "chunk_documents",
    "average_embeddings",
    "build_distinct_sketches",
    "rollup_distinct",
    "heavy_hitters",
    "band_buckets",
    "dedup_against",
    "dedup_lines",
    "k_anonymity_report",
    "levenshtein_refine",
    "minhash_against",
    "ngram_counts",
    "tfidf_top_terms",
    "assign_shards",
    "shard_stats",
    "scd2_history",
    "table_diff",
    "write_shards",
]
