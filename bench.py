"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR.

Default: run the flagship extraction job (synthetic pages corpus scaled to the
sf, read -> sniff -> actor-pool extract -> sharded writes + lineage) and a set
of representative operator queries; print ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

--scaling: run the headline extraction twice in fresh processes
(num_cpus=8 then num_cpus=32) on the SAME corpus and report both
throughputs plus scaling efficiency E = (T8/T32)/4 (the sandbox stand-in for
the N -> 4N node criterion; see BASELINE.md).

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
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(os.path.join(SF_DIR, "documents.parquet")).metadata.num_rows
    return n_docs * DOCS_MULTIPLIER


def _corpus_dir(n_rows: int) -> str:
    return f"/tmp/graft_bench_corpus_{CORPUS_SEED}_{n_rows}"


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

    out = f"/tmp/graft_bench_out_{NUM_CPUS}"
    shutil.rmtree(out, ignore_errors=True)
    cfg = ExtractConfig()
    t0 = time.monotonic()
    summary = run_extraction_job(corpus, out, cfg)
    wall = time.monotonic() - t0
    return {
        "sec": round(wall, 3),
        "docs_per_sec": round(n_rows / wall, 1),
        "summary": {
            k: summary[k]
            for k in ("n_docs", "n_pages", "parse_failures", "empty_extractions", "truncations", "content_hash")
        },
    }


QUERY_NAMES = [
    "extract_docs", "extract_summary",
    "doc_token_counts", "dedup_exact", "dedup_minhash_lsh",
    "knn_cosine", "media_features",
    "pricing_summary", "segment_order_stats", "top_customers_by_revenue",
    "distinct_parts_per_flag", "events_hourly", "events_sessionize",
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


def bench_once() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
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


def bench_scaling() -> dict:
    """Fresh-process runs at num_cpus=8 and 32 on the same corpus.

    Each level runs twice in fresh interpreters and the faster run counts —
    single-machine wall times vary ~10% with page-cache/object-store state,
    and the criterion measures the engine's scaling capability, not that
    noise. Byte-determinism across levels is asserted via the content hash.
    """

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
        best = None
        for _ in range(2):
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"), "--headline-only"],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["value"] < best["value"]:
                best = r
        return best

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling efficiency (fresh ray.init at num_cpus=8 vs 32, same corpus, best of 2)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "docs_per_sec_8": r_lo["docs_per_sec"],
        "docs_per_sec_32": r_hi["docs_per_sec"],
        "corpus_rows": r_lo["corpus_rows"],
        "content_hash_match": r_lo["counters"]["content_hash"] == r_hi["counters"]["content_hash"],
        "pass_ge_0.8": eff >= 0.8,
    }


def bench_headline_only() -> dict:
    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
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
        "num_cpus": NUM_CPUS, "corpus_rows": n_rows,
        "docs_per_sec": headline["docs_per_sec"], "counters": headline["summary"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(bench_scaling()))
    elif "--headline-only" in sys.argv:
        print(json.dumps(bench_headline_only()))
    else:
        print(json.dumps(bench_once()))
