"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline over sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 (+ the training-data-pipeline operators: dedup, similarity
search, text analysis, multimodal plumbing); ``oracle_sql()`` gives DuckDB
equivalents for every SQL-expressible query. Ray is initialised by the
driver BEFORE this module is imported — nothing here calls ray.init().
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import service1_text_extraction_ray as _pkg
from service1_text_extraction_ray.pipelines import queries as Q
from service1_text_extraction_ray.pipelines import relational as R
from service1_text_extraction_ray.pipelines import webtext as W

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on sf0.001: documents -> synthetic pages table ->
    sniff -> actor-pool HTML/PDF extraction -> doc-grain Dataset."""
    _pkg.ensure_worker_importable()
    return Q.q_extract_docs(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    _pkg.ensure_worker_importable()
    return {
        # --- extraction engine (flagship; non-SQL -> rows-only checks) ---
        "extract_docs": Q.q_extract_docs,
        "extract_pages": Q.q_extract_pages,
        "extract_layout_text": Q.q_extract_layout_text,
        "layout_stats": Q.q_layout_stats,
        "render_pages": Q.q_render_pages,
        "extract_summary": Q.q_extract_summary,
        "extract_tables": Q.q_extract_tables,
        "url_host_stats": Q.q_url_host_stats,
        "dedup_edit_distance": Q.q_dedup_edit_distance,
        "extract_outlinks": Q.q_extract_outlinks,
        "host_link_graph": Q.q_host_link_graph,
        "host_pagerank": Q.q_host_pagerank,
        "frontier_scores": Q.q_frontier_scores,
        "label_centroids": Q.q_label_centroids,
        "lang_confusion": Q.q_lang_confusion,
        "dedup_incremental": Q.q_dedup_incremental,
        "extract_meta": Q.q_extract_meta,
        "doc_sentences": Q.q_doc_sentences,
        "write_partitioned": Q.q_write_partitioned,
        "read_partition_pruned": Q.q_read_partition_pruned,
        "dedup_normalized": Q.q_dedup_normalized,
        "doc_compression_ratio": Q.q_doc_compression_ratio,
        "dedup_canonical": Q.q_dedup_canonical,
        # --- text analysis over documents ---
        "doc_token_counts": Q.q_doc_token_counts,
        "doc_bpe_token_counts": Q.q_doc_bpe_token_counts,
        "doc_quality_scores": Q.q_doc_quality_scores,
        "doc_stopword_counts": Q.q_doc_stopword_counts,
        "lang_distribution": Q.q_lang_distribution,
        "doc_normalize_ws": Q.q_doc_normalize_ws,
        "doc_chunk_counts": Q.q_doc_chunk_counts,
        "doc_clean_unicode": Q.q_doc_clean_unicode,
        "language_id": Q.q_language_id,
        "doc_extract_numbers": Q.q_doc_extract_numbers,
        "doc_strip_headers": Q.q_doc_strip_headers,
        "doc_shingle_stats": Q.q_doc_shingle_stats,
        "doc_gopher_filter": Q.q_doc_gopher_filter,
        "doc_sample": Q.q_doc_sample,
        "sample_per_lang": Q.q_sample_per_lang,
        "doc_repetition": Q.q_doc_repetition,
        # --- deduplication ---
        "dedup_exact": Q.q_dedup_exact,
        "dedup_minhash_lsh": Q.q_dedup_minhash_lsh,
        "dedup_jaccard": Q.q_dedup_jaccard,
        "dedup_clusters": Q.q_dedup_clusters,
        "dedup_simhash": Q.q_dedup_simhash,
        "dedup_simhash_pairs": Q.q_dedup_simhash_pairs,
        "dedup_embedding": Q.q_dedup_embedding,
        "dedup_embedding_lsh": Q.q_dedup_embedding_lsh,
        "doc_fingerprints": Q.q_doc_fingerprints,
        # --- embedding generation + chained pipelines ---
        "doc_embeddings": Q.q_doc_embeddings,
        "embeddings_wide": Q.q_embeddings_wide,
        "extract_dedup_near": Q.q_extract_dedup_near,
        "extract_knn": Q.q_extract_knn,
        # --- similarity search ---
        "knn_cosine": Q.q_knn_cosine,
        "knn_batch": Q.q_knn_batch,
        "ann_lsh": Q.q_ann_lsh,
        "ann_ivf": Q.q_ann_ivf,
        "embedding_label_stats": Q.q_embedding_label_stats,
        # --- multimodal plumbing (stub decoder) ---
        "media_features": Q.q_media_features,
        "media_resize": Q.q_media_resize,
        "media_frames": Q.q_media_frames,
        # --- relational / windowed operators ---
        "pricing_summary": R.q_pricing_summary,
        "segment_order_stats": R.q_segment_order_stats,
        "customer_order_counts": R.q_customer_order_counts,
        "customers_dormant": R.q_customers_dormant,
        "customers_with_orders": R.q_customers_with_orders,
        "nation_customer_counts": R.q_nation_customer_counts,
        "top_customers_by_revenue": R.q_top_customers_by_revenue,
        "top_unshipped_orders": R.q_top_unshipped_orders,
        "high_value_orders": R.q_high_value_orders,
        "orders_priority_counts": R.q_orders_priority_counts,
        "part_type_stats": R.q_part_type_stats,
        "supplier_nation_balance": R.q_supplier_nation_balance,
        "order_price_quantiles": R.q_order_price_quantiles,
        "order_price_tdigest": R.q_order_price_tdigest,
        "customers_without_big_orders_bloom": R.q_customers_without_big_orders_bloom,
        "distinct_users_hll": R.q_distinct_users_hll,
        "distinct_parts_per_flag": R.q_distinct_parts_per_flag,
        "events_hourly": R.q_events_hourly,
        "events_sessionize": R.q_events_sessionize,
        "events_sessions": R.q_events_sessions,
        "customers_not_event_users": R.q_customers_not_event_users,
        "events_funnel": R.q_events_funnel,
        "events_retention": R.q_events_retention,
        "events_transitions": R.q_events_transitions,
        "customer_activity_reconcile": R.q_customer_activity_reconcile,
        "part_cooccurrence": R.q_part_cooccurrence,
        "orders_ntile": R.q_orders_ntile,
        "order_price_quantiles_cont": R.q_order_price_quantiles_cont,
        "orders_profile": R.q_orders_profile,
        "nation_revenue": R.q_nation_revenue,
        "distinct_users_per_type_salted": R.q_distinct_users_per_type_salted,
        "events_props_stats": R.q_events_props_stats,
        "events_asof_orders": R.q_events_asof_orders,
        "user_event_type_matrix": R.q_user_event_type_matrix,
        "events_topk_users_hourly": R.q_events_topk_users_hourly,
        "events_sliding_window": R.q_events_sliding_window,
        "top_orders_per_segment": R.q_top_orders_per_segment,
        "customers_without_big_orders": R.q_customers_without_big_orders,
        "orders_latest_per_customer": R.q_orders_latest_per_customer,
        "orders_followup_counts": R.q_orders_followup_counts,
        "user_running_value": R.q_user_running_value,
        "orders_rollup": R.q_orders_rollup,
        "user_event_pivot": R.q_user_event_pivot,
        "order_price_histogram": R.q_order_price_histogram,
        "part_size_mode": R.q_part_size_mode,
        "lineitem_corr": R.q_lineitem_corr,
        # --- web-corpus curation (round 3) ---
        "doc_pii_scan": W.q_doc_pii_scan,
        "doc_tfidf_top_terms": W.q_doc_tfidf_top_terms,
        "doc_contamination": W.q_doc_contamination,
        "dedup_spans": W.q_dedup_spans,
        "corpus_vocab_stats": W.q_corpus_vocab_stats,
        "doc_split_assign": W.q_doc_split_assign,
        "token_postings": W.q_token_postings,
        "corpus_bigrams": W.q_corpus_bigrams,
        "corpus_heavy_hitters": W.q_corpus_heavy_hitters,
        "curate_corpus": W.q_curate_corpus,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "extract_summary": Q.sql_extract_summary(),
        "extract_tables": Q.SQL_EXTRACT_TABLES,
        "url_host_stats": Q.SQL_URL_HOST_STATS,
        "dedup_edit_distance": Q.SQL_DEDUP_EDIT_DISTANCE,
        "extract_outlinks": Q.SQL_EXTRACT_OUTLINKS,
        "host_link_graph": Q.SQL_HOST_LINK_GRAPH,
        "host_pagerank": Q.SQL_HOST_PAGERANK,
        "frontier_scores": Q.SQL_FRONTIER_SCORES,
        "label_centroids": Q.SQL_LABEL_CENTROIDS,
        "lang_confusion": Q.SQL_LANG_CONFUSION,
        "dedup_incremental": Q.SQL_DEDUP_INCREMENTAL,
        "extract_meta": Q.SQL_EXTRACT_META,
        "doc_sentences": Q.SQL_DOC_SENTENCES,
        "write_partitioned": Q.SQL_WRITE_PARTITIONED,
        "read_partition_pruned": Q.SQL_READ_PARTITION_PRUNED,
        "dedup_normalized": Q.SQL_DEDUP_NORMALIZED,
        "dedup_canonical": Q.SQL_DEDUP_CANONICAL,
        "doc_token_counts": Q.SQL_DOC_TOKEN_COUNTS,
        "doc_bpe_token_counts": Q.SQL_DOC_BPE_TOKEN_COUNTS,
        "doc_quality_scores": Q.SQL_DOC_QUALITY_SCORES,
        "doc_stopword_counts": Q.SQL_DOC_STOPWORD_COUNTS,
        "lang_distribution": Q.SQL_LANG_DISTRIBUTION,
        "doc_normalize_ws": Q.SQL_DOC_NORMALIZE_WS,
        "doc_chunk_counts": Q.SQL_DOC_CHUNK_COUNTS,
        "doc_clean_unicode": Q.SQL_DOC_CLEAN_UNICODE,
        "language_id": Q.SQL_LANGUAGE_ID,
        "doc_extract_numbers": Q.SQL_DOC_EXTRACT_NUMBERS,
        "doc_strip_headers": Q.SQL_DOC_STRIP_HEADERS,
        "doc_shingle_stats": Q.SQL_DOC_SHINGLE_STATS,
        "doc_gopher_filter": Q.SQL_DOC_GOPHER_FILTER,
        "doc_sample": Q.SQL_DOC_SAMPLE,
        "sample_per_lang": Q.SQL_SAMPLE_PER_LANG,
        "doc_repetition": Q.SQL_DOC_REPETITION,
        "doc_fingerprints": Q.SQL_DOC_FINGERPRINTS,
        "dedup_exact": Q.SQL_DEDUP_EXACT,
        "dedup_minhash_lsh": Q.sql_dedup_minhash_lsh(),
        "dedup_jaccard": Q.SQL_DEDUP_JACCARD,
        "dedup_clusters": Q.sql_dedup_clusters(),
        "dedup_simhash": Q.SQL_DEDUP_SIMHASH,
        "dedup_simhash_pairs": Q.SQL_DEDUP_SIMHASH_PAIRS,
        "dedup_embedding": Q.SQL_DEDUP_EMBEDDING,
        "dedup_embedding_lsh": Q.sql_dedup_embedding_lsh(),
        "knn_cosine": Q.sql_knn_cosine(),
        "knn_batch": Q.sql_knn_batch(),
        "ann_lsh": Q.sql_ann_lsh(),
        "ann_ivf": Q.sql_ann_ivf(),
        "embedding_label_stats": Q.SQL_EMBEDDING_LABEL_STATS,
        "media_features": Q.SQL_MEDIA_FEATURES,
        "media_resize": Q.SQL_MEDIA_RESIZE,
        "media_frames": Q.SQL_MEDIA_FRAMES,
        "pricing_summary": R.SQL_PRICING_SUMMARY,
        "segment_order_stats": R.SQL_SEGMENT_ORDER_STATS,
        "customer_order_counts": R.SQL_CUSTOMER_ORDER_COUNTS,
        "customers_dormant": R.SQL_CUSTOMERS_DORMANT,
        "customers_with_orders": R.SQL_CUSTOMERS_WITH_ORDERS,
        "nation_customer_counts": R.SQL_NATION_CUSTOMER_COUNTS,
        "top_customers_by_revenue": R.SQL_TOP_CUSTOMERS_BY_REVENUE,
        "top_unshipped_orders": R.SQL_TOP_UNSHIPPED_ORDERS,
        "high_value_orders": R.SQL_HIGH_VALUE_ORDERS,
        "orders_priority_counts": R.SQL_ORDERS_PRIORITY_COUNTS,
        "part_type_stats": R.SQL_PART_TYPE_STATS,
        "supplier_nation_balance": R.SQL_SUPPLIER_NATION_BALANCE,
        "order_price_quantiles": R.SQL_ORDER_PRICE_QUANTILES,
        "distinct_parts_per_flag": R.SQL_DISTINCT_PARTS_PER_FLAG,
        "distinct_users_hll": R.SQL_DISTINCT_USERS_HLL,
        "events_hourly": R.SQL_EVENTS_HOURLY,
        "events_sessionize": R.SQL_EVENTS_SESSIONIZE,
        "events_sessions": R.SQL_EVENTS_SESSIONS,
        "customers_not_event_users": R.SQL_CUSTOMERS_NOT_EVENT_USERS,
        "events_funnel": R.SQL_EVENTS_FUNNEL,
        "events_retention": R.SQL_EVENTS_RETENTION,
        "events_transitions": R.SQL_EVENTS_TRANSITIONS,
        "customer_activity_reconcile": R.SQL_CUSTOMER_ACTIVITY_RECONCILE,
        "part_cooccurrence": R.SQL_PART_COOCCURRENCE,
        "orders_ntile": R.SQL_ORDERS_NTILE,
        "order_price_quantiles_cont": R.SQL_ORDER_PRICE_QUANTILES_CONT,
        "orders_profile": R.SQL_ORDERS_PROFILE,
        "nation_revenue": R.SQL_NATION_REVENUE,
        "distinct_users_per_type_salted": R.SQL_DISTINCT_USERS_PER_TYPE_SALTED,
        "events_props_stats": R.SQL_EVENTS_PROPS_STATS,
        "events_asof_orders": R.SQL_EVENTS_ASOF_ORDERS,
        "user_event_type_matrix": R.SQL_USER_EVENT_TYPE_MATRIX,
        "events_topk_users_hourly": R.SQL_EVENTS_TOPK_USERS_HOURLY,
        "events_sliding_window": R.SQL_EVENTS_SLIDING_WINDOW,
        "top_orders_per_segment": R.SQL_TOP_ORDERS_PER_SEGMENT,
        "customers_without_big_orders": R.SQL_CUSTOMERS_WITHOUT_BIG_ORDERS,
        # bloom variant is EXACT (bloom negatives + rechecked positives) ->
        # shares the exact anti-join's oracle
        "customers_without_big_orders_bloom": R.SQL_CUSTOMERS_WITHOUT_BIG_ORDERS,
        "orders_latest_per_customer": R.SQL_ORDERS_LATEST_PER_CUSTOMER,
        "orders_followup_counts": R.SQL_ORDERS_FOLLOWUP_COUNTS,
        "user_running_value": R.SQL_USER_RUNNING_VALUE,
        "orders_rollup": R.SQL_ORDERS_ROLLUP,
        "user_event_pivot": R.SQL_USER_EVENT_PIVOT,
        "order_price_histogram": R.SQL_ORDER_PRICE_HISTOGRAM,
        "part_size_mode": R.SQL_PART_SIZE_MODE,
        "lineitem_corr": R.SQL_LINEITEM_CORR,
        "doc_pii_scan": W.SQL_DOC_PII_SCAN,
        "doc_tfidf_top_terms": W.SQL_DOC_TFIDF_TOP_TERMS,
        "doc_contamination": W.SQL_DOC_CONTAMINATION,
        "dedup_spans": W.SQL_DEDUP_SPANS,
        "corpus_vocab_stats": W.SQL_CORPUS_VOCAB_STATS,
        "doc_split_assign": W.SQL_DOC_SPLIT_ASSIGN,
        "token_postings": W.SQL_TOKEN_POSTINGS,
        "corpus_bigrams": W.SQL_CORPUS_BIGRAMS,
        "corpus_heavy_hitters": W.SQL_CORPUS_HEAVY_HITTERS,
        "curate_corpus": W.sql_curate_corpus(),
    }
