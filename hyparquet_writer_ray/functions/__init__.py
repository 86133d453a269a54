"""Training-data operators: dedup, similarity search, text analysis,
windows/sessions, sketches, multimodal plumbing."""
from .dedup import (
    MinHasher,
    SimHasher,
    exact_dedup,
    exact_dedup_rows,
    latest_by_key,
    minhash_lsh_pairs,
    paragraph_dedup,
    ngram_jaccard_pairs,
    simhashes,
)
from .multimodal import FrameSampleStage, ImageDecodeStage, decode_images, sample_frames
from .joins import asof_join, broadcast_join, hash_join, interval_join
from .similarity import (
    HyperplaneBucketer,
    exact_cosine_pairs,
    ivf_topk,
    lsh_bucket_pairs,
    topk_cosine,
)
from .sketches import (
    cms_estimate,
    count_min_sketch,
    dd_quantile_estimate,
    dd_quantile_sketch,
    grouped_dd_quantiles,
    grouped_hll_distinct,
    hll_distinct,
    hll_estimate,
)
from .lm import LMScorer, bigram_model, lm_score, train_bigram_lm, vocab_size
from .shuffle import deterministic_shuffle, shuffle_key, weighted_sample
from .text import (
    LangIdModel,
    bpe_token_counts,
    fingerprints,
    lang_ids,
    quality_scores,
    Decontaminator,
    benchmark_grams,
    decontaminate,
    distinctive_terms,
    redact,
    repetition_stats,
    rolling_fingerprints,
    inverted_index,
    stratified_sample,
    token_counts,
    top_tokens,
)
from .semistructured import json_extract_batch, json_extract_field
from .audio import AudioFeatureStage, audio_features
from .graph import connected_components, drop_near_duplicates
from .ingest import SeenFilter, filter_seen
from .stats import (
    exact_quantiles,
    group_topk,
    grouped_quantiles,
    histogram,
    profile_table,
)
from .packing import pack_sequences
from .web import DomainFilter, domain_stats, filter_domains, html_to_text, parse_urls
from .windows import hopping_window_agg, sessionize, tumbling_window_agg

__all__ = [
    "MinHasher", "SimHasher", "connected_components", "drop_near_duplicates", "exact_dedup",
    "exact_dedup_rows", "latest_by_key", "minhash_lsh_pairs", "ngram_jaccard_pairs",
    "paragraph_dedup",
    "simhashes",
    "ImageDecodeStage", "FrameSampleStage", "decode_images", "sample_frames",
    "AudioFeatureStage", "audio_features",
    "HyperplaneBucketer", "exact_cosine_pairs", "ivf_topk",
    "lsh_bucket_pairs", "topk_cosine",
    "asof_join", "broadcast_join", "hash_join", "interval_join",
    "hll_distinct", "hll_estimate", "grouped_hll_distinct",
    "count_min_sketch", "cms_estimate", "dd_quantile_sketch", "dd_quantile_estimate", "grouped_dd_quantiles",
    "LMScorer", "bigram_model", "lm_score", "train_bigram_lm", "vocab_size",
    "deterministic_shuffle", "shuffle_key", "weighted_sample", "histogram",
    "exact_quantiles", "group_topk", "grouped_quantiles",
    "LangIdModel", "bpe_token_counts", "fingerprints", "lang_ids",
    "quality_scores", "Decontaminator", "benchmark_grams", "decontaminate",
    "distinctive_terms", "redact", "repetition_stats",
    "inverted_index", "rolling_fingerprints", "stratified_sample",
    "token_counts", "top_tokens",
    "hopping_window_agg", "sessionize", "tumbling_window_agg",
    "SeenFilter", "filter_seen",
    "json_extract_batch", "json_extract_field", "profile_table",
    "DomainFilter", "domain_stats", "filter_domains", "html_to_text", "parse_urls",
    "pack_sequences",
]
