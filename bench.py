"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR.

Default: run the flagship extraction job (synthetic pages corpus scaled to the
sf, read -> sniff -> actor-pool extract -> sharded writes + lineage) and a set
of representative operator queries; print ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

Scaling protocols (all detailed in BENCH/BASELINE.md):
--scaling       sequential 8-vs-32-CPU fresh-process pairs (raw efficiency
                gates pass/fail; platform decomposition reported as context)
--scaling-weak  50k docs @8 vs 200k @32 (work scales with cores)
--scaling-iso   one 32-cpu job vs four CONCURRENT independent 8-cpu jobs —
                both sides saturate the host, so shared-box effects cancel
                and the ratio measures pure engine coordination overhead

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Bench corpus: DOCS_MULTIPLIER x the sf's documents-table row count of mixed
# synthetic pages (FIXTURES.md mix) — 200k docs at sf0.1, the top of the
# 50k-200k range BASELINE.md's protocol calls for (>=60 s of work at the low
# parallelism level so fixed startup costs amortize).
DOCS_MULTIPLIER = 40
CORPUS_SEED = 42


def _corpus_rows() -> int:
    override = os.environ.get("GRAFT_BENCH_ROWS")
    if override:
        return int(override)
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(os.path.join(SF_DIR, "documents.parquet")).metadata.num_rows
    return n_docs * DOCS_MULTIPLIER


def _corpus_fingerprint() -> str:
    """Content fingerprint of the generator itself: hash a probe set of rows
    spanning every payload category, so a cached corpus regenerates whenever
    synth.make_row changes (e.g. the round-2 encrypted fixtures)."""
    import hashlib

    from service1_text_extraction_ray.functions.synth import make_row

    h = hashlib.md5()
    for i in list(range(0, 100)) + [1007]:
        h.update(make_row(i, seed=CORPUS_SEED)["html"])
    return h.hexdigest()[:12]


def _corpus_dir(n_rows: int) -> str:
    return f"/tmp/graft_bench_corpus_{CORPUS_SEED}_{n_rows}_{_corpus_fingerprint()}"


def ensure_corpus(n_rows: int) -> str:
    """Materialize the bench corpus once (untimed); reused across runs and
    parallelism levels so every measurement sees identical input."""
    path = _corpus_dir(n_rows)
    marker = os.path.join(path, "_COMPLETE")
    if os.path.exists(marker):
        return path
    import ray.data  # noqa: F401  (Ray already initialised by caller)

    from service1_text_extraction_ray.sources.pages_source import synthesize_pages

    shutil.rmtree(path, ignore_errors=True)
    synthesize_pages(n_rows, seed=CORPUS_SEED).write_parquet(path)
    with open(marker, "w") as f:
        f.write(str(n_rows))
    return path


def run_headline(corpus: str, n_rows: int) -> dict:
    from service1_text_extraction_ray.functions.extract import ExtractConfig
    from service1_text_extraction_ray.pipelines.extract_pipeline import run_extraction_job

    # GRAFT_FILE_SHARD="i:n" -> process only every n-th corpus file starting
    # at i (one "node" of the isolated-nodes scaling protocol).
    shard = os.environ.get("GRAFT_FILE_SHARD")
    if shard:
        import pyarrow.parquet as pq

        i, n = (int(x) for x in shard.split(":"))
        files = sorted(str(p) for p in Path(corpus).glob("*.parquet"))[i::n]
        corpus = files  # run_extraction_job accepts a file list
        n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    out = f"/tmp/graft_bench_out_{NUM_CPUS}_{os.environ.get('GRAFT_FILE_SHARD', 'full').replace(':', '_')}"
    cfg = ExtractConfig()
    rows_processed = n_rows
    # Protocol note: the timed run includes job startup (worker spin-up,
    # package shipping, actor-pool construction) at BOTH parallelism levels —
    # exactly what `ray job submit` pays on a real cluster at N and 4N nodes.
    # A warmed-engine variant was measured and rejected: on this shared
    # sandbox, steady-state throughput degrades run-over-run within one Ray
    # session (object-store/page-cache state), making warm measurements far
    # noisier than cold fresh-process ones.
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.monotonic()
    summary = run_extraction_job(corpus, out, cfg)
    wall = time.monotonic() - t0
    return {
        "sec": round(wall, 3),
        "rows": n_rows,
        "docs_per_sec": round(n_rows / wall, 1),
        "summary": {
            k: summary[k]
            for k in ("n_docs", "n_pages", "parse_failures", "empty_extractions", "truncations", "content_hash")
        },
    }


QUERY_NAMES = [
    "extract_docs", "extract_summary",
    "doc_token_counts", "doc_gopher_filter", "doc_sample",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs", "dedup_embedding",
    "doc_embeddings", "extract_dedup_near",
    "knn_cosine", "ann_ivf", "media_features",
    "pricing_summary", "segment_order_stats", "top_customers_by_revenue",
    "distinct_parts_per_flag", "events_hourly", "events_sessionize",
    "events_asof_orders", "events_sliding_window", "top_orders_per_segment",
    "doc_pii_scan", "doc_tfidf_top_terms", "dedup_spans",
    "token_postings", "corpus_bigrams", "corpus_heavy_hitters",
    "customer_order_counts",
    "orders_latest_per_customer", "orders_followup_counts", "user_running_value",
    "top_unshipped_orders", "curate_corpus",
    "orders_rollup", "user_event_pivot", "order_price_histogram",
    "part_size_mode", "lineitem_corr",
    "events_funnel", "events_retention", "events_props_stats",
    "url_host_stats", "extract_outlinks", "host_link_graph",
    "dedup_edit_distance", "host_pagerank", "nation_revenue",
    "frontier_scores", "label_centroids", "part_cooccurrence",
    "customer_activity_reconcile", "events_transitions", "dedup_normalized",
    "extract_meta", "lang_confusion",
    "user_event_gaps", "parts_both_nations", "host_components",
    "corpus_cms_counts", "doc_sample_weighted", "orders_cube",
    "orders_above_cust_avg", "events_outliers", "dedup_jaccard_prefix",
    "distinct_users_hll_by_type", "orders_percent_rank", "user_event_paths",
    "dedup_near_clusters", "order_price_histogram_eqd", "extract_pdf_info", "orders_mom",
    "events_top_paths", "user_value_moving_sum", "knn_self_1nn", "kmeans_embeddings",
    "part_skyline", "priority_price_trend", "event_type_entropy",
    "segment_acctbal_moments", "part_reach", "doc_unigram_logprob",
    "lineitem_spearman", "customer_order_streaks", "lang_top_tokens",
    "orders_checksums", "orders_winsorized_mean", "segment_balance_mad",
    "part_triangles", "events_user_skew",
    "doc_pack_sequences", "dedup_url_canonical", "doc_length_band",
    "host_anchor_terms",
    "user_state_intervals", "user_value_trailing_1h", "events_late_arrivals",
    "embedding_gram", "embedding_quantize_int8", "doc_shingle_novelty", "search_bm25", "host_crawl_budget", "corpus_zipf_fit",
    "user_interval_overlaps", "frontier_allowed", "host_sitemap_urls",
    "customer_360", "events_dedup_window", "event_type_overlap",
    "crawl_plan", "extract_jsonld", "extract_feed",
    "feed_freshness", "jsonld_type_counts", "extract_pdf_links", "extract_image_alts",
    "extract_hreflang", "hreflang_clusters", "extract_pdf_outline", "extract_microdata",
    "discover_feeds", "extract_rdfa", "crawl_schedule",
    "extract_pagination", "pagination_chains",
    "host_hits", "host_seed_distance", "host_boilerplate_lines",
    "doc_strip_boilerplate", "page_indexability", "corpus_pmi",
    "recrawl_diff", "promo_revenue_share", "nation_pair_volume",
    "host_templates", "doc_bigram_logprob", "host_quality",
    "host_mirror_overlap", "sitemap_coverage", "search_phrase", "ann_pq",
    "doc_ppl_buckets", "doc_keywords_rake", "doc_char_entropy", "doc_license",
    "customer_rfm", "host_communities", "orders_zorder", "lineitem_ols2", "users_cdc_state", "extract_eval", "extract_social_card", "events_pattern_matches", "warc_cdx", "media_dedup_phash", "host_reciprocity", "doc_dehyphenate", "extract_meta_refresh", "extract_forms", "lineitem_mutual_info", "extract_pdf_attachments", "host_lang_divergence", "doc_citations", "trending_terms", "extract_pdf_page_labels", "part_rules",
    "customer_order_distribution", "part_small_qty_revenue", "customers_untapped",
    "host_kcore", "host_clustering", "host_components_star", "host_assortativity",
    "user_value_rolling_median", "lang_nb_classify", "events_new_users",
    "knn_int8", "part_top_supplier", "orders_large_volume", "suppliers_late_sole",
    "doc_readability", "events_sessionize_incremental",
    "corpus_dsir_weights", "corpus_bpe_merges", "dedup_select_best",
    "extract_pdf_forms", "extract_pdf_xmp", "doc_blocklist_filter",
    "doc_sample_wor", "doc_shuffle_rank", "events_window_final",
    "orders_daily_ewma", "doc_bpe_encode", "dedup_lines_global",
    "embedding_pca_power", "dedup_semantic", "extract_headings",
    "dedup_substrings", "retrieval_mmr", "events_rate_limit",
    "extract_pdf_annots",
    "redirect_resolve", "order_price_median_select", "corpus_kn_bigram",
    "retrieval_rrf", "extract_pdf_fonts", "extract_pdf_layers",
    "quality_auc", "corpus_mix_plan", "search_ndcg", "host_sssp",
    "nation_market_share", "events_cusum", "host_trustrank",
    "orders_daily_gapfill", "dedup_lsh_recall", "dedup_minhash_cap", "orders_daily_holt", "ann_recall", "lineitem_benford",
    "part_supplier_reach", "events_stream_join", "extract_pdf_structure",
    "corpus_simpson", "orders_pareto",
    # round-4 capability adds: the OCR ladder (full scanned-corpus
    # rasterize+recognize — the one genuinely model-ish stage, so its cost
    # belongs in the record), real-decode multimodal, archive ingest,
    # profiling, NFC
    "ocr_eval", "media_decode", "media_resize_px", "media_audio_decode",
    "media_video_frames", "archive_tar_roundtrip", "archive_zip_roundtrip",
    "table_profile", "doc_nfc_normalize",
    # round-5 adds
    "host_transitivity", "table_upsert", "warc_salvage", "archive_salvage",
]


def run_queries() -> dict:
    import ray.data as rd

    import __ray_entry__ as E

    qs = E.queries()
    times = {}
    for name in QUERY_NAMES:
        t0 = time.monotonic()
        res = qs[name](SF_DIR)
        if isinstance(res, rd.Dataset):
            # consume the stream without materializing to the driver
            for _ in res.iter_batches(batch_size=8192, batch_format="pyarrow"):
                pass
        times[name] = round(time.monotonic() - t0, 3)
    return times


def _mute_empty_block_schema_warnings() -> None:
    """Shared with the package (installed at its import; see
    service1_text_extraction_ray._mute_empty_bundle_schema_warnings)."""
    from service1_text_extraction_ray import _mute_empty_bundle_schema_warnings

    _mute_empty_bundle_schema_warnings()


def bench_once() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    _mute_empty_block_schema_warnings()
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    n_rows = _corpus_rows()
    corpus = ensure_corpus(n_rows)
    # Warm the page cache so we measure compute+shuffle, not first disk read.
    import pyarrow.parquet as pq

    for f in sorted(Path(corpus).glob("*.parquet")):
        pq.read_table(f)

    headline = run_headline(corpus, n_rows)
    queries = run_queries()
    ray.shutdown()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "extraction pipeline wall time (synthetic pages corpus, read->sniff->extract->sharded write)",
        "value": headline["sec"],
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_cpus": NUM_CPUS,
        "corpus_rows": n_rows,
        "docs_per_sec": headline["docs_per_sec"],
        "counters": headline["summary"],
    }


def _run_headline_subprocess(ncpu: int, rows: int | None = None) -> dict:
    """One fresh-process headline run (shared by both scaling protocols)."""
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
    if rows is not None:
        env["GRAFT_BENCH_ROWS"] = str(rows)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--headline-only"],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def _platform_control(corpus: str) -> dict:
    """Platform per-core scaling control: the pure extraction function (no
    Ray) run in K worker processes at the engine's two actor-pool sizes.

    A single shared-memory machine is NOT a faithful model of N -> 4N
    *nodes*: going 8 -> 32 busy cores saturates the memory bus and drops
    all-core turbo, so per-core throughput falls for ANY engine (measured
    ~0.77 for this parse workload, ~0.86 even for a trivial pure-Python
    loop). On 4N real nodes each node keeps its own memory domain and the
    factor is ~1. This control isolates that hardware effect so the raw
    single-machine efficiency can be decomposed into
    platform_factor x engine_factor; the engine factor is what transfers to
    a real cluster.
    """
    import multiprocessing as mp

    files = sorted(p for p in Path(corpus).glob("*.parquet"))
    control_file = str(files[0])

    lo_procs, hi_procs = 7, 28  # the extract pools' typical sizes at 8/32 CPUs

    def run(nproc: int) -> float:
        # The file path travels as the map argument (start-method agnostic;
        # a mutated module global would be invisible under spawn/forkserver).
        with mp.Pool(nproc) as pool:
            rates = pool.map(_control_worker, [control_file] * nproc)
        return sum(rates) / len(rates)

    # Two interleaved reps: the lo -> hi sequence inside one rep is itself
    # exposed to machine drift, so average the per-rep factors.
    factors, rates = [], []
    for _ in range(2):
        r_lo = run(lo_procs)
        r_hi = run(hi_procs)
        factors.append(r_hi / r_lo)
        rates.append((round(r_lo, 1), round(r_hi, 1)))
    return {
        "control_rates_per_proc": rates,
        "platform_per_core_factor": round(sum(factors) / len(factors), 3),
        "control_procs": [lo_procs, hi_procs],
    }


def _control_worker(control_file: str) -> float:
    import pyarrow.parquet as pq

    from service1_text_extraction_ray.functions.extract import (
        ExtractConfig,
        extract_document,
    )

    t = pq.read_table(control_file, columns=["url", "html"])
    urls, payloads = t["url"].to_pylist(), t["html"].to_pylist()
    cfg = ExtractConfig()
    t0 = time.monotonic()
    for u, p in zip(urls, payloads):
        extract_document(u, p, cfg)
    return len(urls) / (time.monotonic() - t0)


def bench_scaling() -> dict:
    """Fresh-process runs at num_cpus=8 and 32 on the same corpus, as three
    interleaved (8, 32) pairs; the MEDIAN pair counts and all pairs are
    reported (the criterion measures the engine's scaling capability, not
    this VM's noisy-neighbor drift). Byte-determinism across levels is
    asserted via the content hash.

    Reports the raw single-machine efficiency AND its decomposition into
    platform x engine factors (see _platform_control): the engine factor is
    the number that models N -> 4N separate-memory nodes.
    """

    # Interleave the levels into adjacent (8, 32) pairs: this sandbox VM's
    # absolute speed drifts tens of percent over minutes (noisy neighbors),
    # and a drift between the 8-block and the 32-block of a sequential
    # protocol corrupts the RATIO. Within a pair both levels see ~the same
    # machine. The MEDIAN pair is the estimator (max would cherry-pick pairs
    # whose drift happened to inflate the ratio — observed raw "efficiencies"
    # up to 0.96 from a slow-window 8-run, which is measurement corruption,
    # not scaling). All pairs are reported.
    lo, hi = 8, 32
    pairs = []
    for _ in range(3):
        pairs.append((_run_headline_subprocess(lo), _run_headline_subprocess(hi)))
    raw_effs = [round((a["value"] / b["value"]) / (hi / lo), 3) for a, b in pairs]
    order = sorted(range(len(pairs)), key=lambda i: raw_effs[i])
    med_i = order[len(order) // 2]
    r_lo, r_hi = pairs[med_i]
    raw_eff = raw_effs[med_i]

    n_rows = r_lo["corpus_rows"]
    control = _platform_control(_corpus_dir(n_rows))
    platform = control["platform_per_core_factor"]
    # Informational decomposition only: dividing by a self-measured factor <1
    # can only raise the number, so it must never decide pass/fail. The gate
    # below is on the RAW measured efficiency; the separate-memory-node model
    # is evidenced by bench_scaling_weak (which needs no correction).
    engine_eff = min(1.0, raw_eff / platform) if platform > 0 else raw_eff

    return {
        "metric": (
            "strong-scaling efficiency, num_cpus=8 vs 32 in fresh processes "
            "(raw, uncorrected; the platform/engine decomposition is reported "
            "for context only — see BENCH/BASELINE.md)"
        ),
        "value": raw_eff,
        "unit": "efficiency",
        "raw_single_machine_efficiency": raw_eff,
        "raw_efficiency_all_pairs": raw_effs,
        "engine_efficiency_derived_informational": round(engine_eff, 3),
        **control,
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "docs_per_sec_8": r_lo["docs_per_sec"],
        "docs_per_sec_32": r_hi["docs_per_sec"],
        "corpus_rows": n_rows,
        "content_hash_match": r_lo["counters"]["content_hash"] == r_hi["counters"]["content_hash"],
        "pass_ge_0.8": raw_eff >= 0.8,
    }


def bench_scaling_weak() -> dict:
    """Weak scaling: W docs at 8 CPUs vs 4W docs at 32 CPUs, fresh
    processes. Models the real N -> 4N criterion most directly — a 4x
    cluster gets 4x data, so fixed startup amortizes identically at both
    levels and 'sustained throughput' is what's measured. Efficiency =
    throughput_32 / (4 x throughput_8)."""
    lo, hi = 8, 32
    base_rows = _corpus_rows() // 4

    # Median of 3 interleaved pairs, clamped to 1.0 — same noise discipline
    # as bench_scaling (a >1 "efficiency" is a drift-corrupted window, not
    # super-linear scaling).
    effs, detail = [], []
    for _ in range(3):
        r_lo = _run_headline_subprocess(lo, base_rows)
        r_hi = _run_headline_subprocess(hi, base_rows * 4)
        eff = r_hi["docs_per_sec"] / (4 * r_lo["docs_per_sec"])
        effs.append(round(eff, 3))
        detail.append({"docs_per_sec_8": r_lo["docs_per_sec"],
                       "docs_per_sec_32": r_hi["docs_per_sec"],
                       "sec_8": r_lo["value"], "sec_32": r_hi["value"]})
    order = sorted(range(len(effs)), key=lambda i: effs[i])
    med_i = order[len(order) // 2]
    return {
        "metric": "weak-scaling efficiency (W docs @8 cpus vs 4W docs @32 cpus, fresh processes, median of 3 pairs, clamped to 1)",
        "value": min(1.0, effs[med_i]),
        "unit": "efficiency",
        "all_pairs": effs,
        "rows_8": base_rows,
        "rows_32": base_rows * 4,
        **detail[med_i],
        "pass_ge_0.8": min(1.0, effs[med_i]) >= 0.8,
    }


def bench_scaling_iso() -> dict:
    """Isolated-nodes scaling protocol: FOUR concurrent fresh-process jobs at
    num_cpus=8, each over an interleaved quarter of the corpus files (= a
    4-node cluster of 8-CPU nodes with no cross-node coordination — the
    embarrassingly-parallel ideal), vs ONE fresh-process num_cpus=32 job over
    the full corpus. Both sides keep all 32 host cores busy, so shared-box
    effects (memory-bus saturation, all-core turbo) hit BOTH measurements
    equally — unlike the sequential 8-vs-32 protocol, where the "8-CPU
    cluster" borrows the idle box's full memory bandwidth and the ratio
    under-counts the engine. Efficiency = throughput(1x32) /
    aggregate-throughput(4x8): exactly the coordination overhead a 4x-bigger
    cluster adds, with hardware held constant. Median of 3 interleaved reps.
    """
    import concurrent.futures as cf

    lo, hi, n_nodes = 8, 32, 4
    n_rows = _corpus_rows()
    # Warm the corpus cache once (untimed) before any measurement.
    env0 = dict(os.environ, RAY_GRAFT_CPUS="8", GRAFT_SF_DIR=SF_DIR,
                GRAFT_BENCH_ROWS=str(n_rows))
    subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {REPO!r}); import ray, bench;"
         "ray.init(address='local', num_cpus=4, include_dashboard=False, logging_level='ERROR');"
         f"bench.ensure_corpus({n_rows}); ray.shutdown()"],
        env=env0, capture_output=True, check=True,
    )

    def one_node(i: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(lo), GRAFT_SF_DIR=SF_DIR,
                   GRAFT_BENCH_ROWS=str(n_rows), GRAFT_FILE_SHARD=f"{i}:{n_nodes}",
                   RAY_TMPDIR=f"/tmp/ray_iso_{i}",
                   # 4 concurrent local clusters must not each claim the
                   # default ~40% of host memory for their object stores
                   GRAFT_OBJ_STORE_BYTES=str(8 * 1024**3))
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--headline-only"],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    effs, detail = [], []
    for _ in range(3):
        t0 = time.monotonic()
        with cf.ThreadPoolExecutor(n_nodes) as ex:
            node_results = list(ex.map(one_node, range(n_nodes)))
        wall_4x8 = time.monotonic() - t0
        rows_done = sum(r["corpus_rows"] for r in node_results)
        # Job-only aggregate: nodes launch together and shards are balanced,
        # so the slowest node's JOB time is the cluster's makespan — the same
        # accounting as the 32-side's docs_per_sec (job seconds, startup
        # excluded on both sides). wall_4x8 (incl. per-node process + init)
        # is reported alongside for transparency.
        thr_4x8 = rows_done / max(r["value"] for r in node_results)

        r32 = _run_headline_subprocess(hi, n_rows)
        thr_32 = r32["docs_per_sec"]
        effs.append(round(thr_32 / thr_4x8, 3))
        detail.append({
            "docs_per_sec_4x8_aggregate": round(thr_4x8, 1),
            "wall_4x8_incl_startup": round(wall_4x8, 2),
            "node_secs": [r["value"] for r in node_results],
            "node_rows": [r["corpus_rows"] for r in node_results],
            "docs_per_sec_32": thr_32,
            "sec_32": r32["value"],
        })
    order = sorted(range(len(effs)), key=lambda i: effs[i])
    med_i = order[len(order) // 2]
    value = min(1.0, effs[med_i])
    return {
        "metric": (
            "isolated-nodes scaling efficiency: one 32-cpu job vs four "
            "concurrent independent 8-cpu jobs on interleaved quarters of the "
            "same corpus (both sides saturate the host -> shared-box effects "
            "cancel; measures pure engine coordination overhead of a 4x "
            "cluster)"
        ),
        "value": value,
        "unit": "efficiency",
        "all_reps": effs,
        **detail[med_i],
        "corpus_rows": n_rows,
        "pass_ge_0.8": value >= 0.8,
    }


def bench_headline_only() -> dict:
    import ray

    obj = os.environ.get("GRAFT_OBJ_STORE_BYTES")
    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
        **({"object_store_memory": int(obj)} if obj else {}),
    )
    _mute_empty_block_schema_warnings()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    n_rows = _corpus_rows()
    corpus = ensure_corpus(n_rows)
    import pyarrow.parquet as pq

    for f in sorted(Path(corpus).glob("*.parquet")):
        pq.read_table(f)
    headline = run_headline(corpus, n_rows)
    ray.shutdown()
    return {
        "metric": "extraction headline", "value": headline["sec"], "unit": "sec",
        "num_cpus": NUM_CPUS, "corpus_rows": headline["rows"],
        "docs_per_sec": headline["docs_per_sec"], "counters": headline["summary"],
    }


def _emit_default(full: dict) -> None:
    """Print the full record first, then a COMPACT headline as the final
    stdout line.

    The round driver keeps only the last ~2 KB of stdout and parses the last
    line; round 3's single giant line (223 per-query timings inline) overflowed
    that window and the headline was lost (`BENCH_r03.json parsed: null`). The
    per-query timings now travel on their own earlier line AND in
    BENCH/last_full.json; the final line stays well under the tail capture.
    """
    print(json.dumps(full))
    try:
        with open(os.path.join(REPO, "BENCH", "last_full.json"), "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        pass
    qs = full.get("queries", {})
    qtimes = sorted(qs.values(), reverse=True)
    compact = {k: v for k, v in full.items() if k != "queries"}
    compact["queries_n"] = len(qs)
    compact["queries_total_sec"] = round(sum(qtimes), 3)
    compact["queries_top5"] = {
        k: v for k, v in sorted(qs.items(), key=lambda kv: -kv[1])[:5]
    }
    compact["queries_detail"] = "line 1 of stdout + BENCH/last_full.json"
    line = json.dumps(compact)
    assert len(line) < 1800, f"compact headline too long ({len(line)} B)"
    print(line)


if __name__ == "__main__":
    if "--scaling-iso" in sys.argv:
        print(json.dumps(bench_scaling_iso()))
    elif "--scaling-weak" in sys.argv:
        print(json.dumps(bench_scaling_weak()))
    elif "--scaling" in sys.argv:
        print(json.dumps(bench_scaling()))
    elif "--headline-only" in sys.argv:
        print(json.dumps(bench_headline_only()))
    else:
        _emit_default(bench_once())
