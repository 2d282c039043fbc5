"""End-to-end golden tests: the distributed Ray job must produce
byte-identical extractions to the sequential oracle, at any parallelism,
and must resume correctly from per-shard lineage."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from service1_text_extraction_ray.functions.extract import ExtractConfig, extract_document
from service1_text_extraction_ray.functions.synth import gen_pages_table, write_pages_parquet
from service1_text_extraction_ray.pipelines.extract_pipeline import (
    extract_dataset,
    extract_pages_dataset,
    run_extraction_job,
)
from service1_text_extraction_ray.state import lineage as lin

N_ROWS = 400
CFG = ExtractConfig(n_shards=8)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    write_pages_parquet(d, N_ROWS, seed=42, rows_per_file=100)
    return d


@pytest.fixture(scope="module")
def oracle_results():
    rows = gen_pages_table(N_ROWS, seed=42).to_pylist()
    return {row["url"]: extract_document(row["url"], row["html"], CFG) for row in rows}


def read_output(out_dir: str) -> pa.Table:
    files = sorted(glob.glob(os.path.join(out_dir, "data", "*.parquet")))
    return pa.concat_tables([pq.read_table(f) for f in files])


def assert_matches_oracle(table: pa.Table, oracle: dict):
    assert table.num_rows == len(oracle)
    for url, doc_text, status, n_pages in zip(
        table["url"].to_pylist(),
        table["doc_text"].to_pylist(),
        table["status"].to_pylist(),
        table["n_pages"].to_pylist(),
    ):
        o = oracle[url]
        assert doc_text == o["doc_text"], f"byte mismatch for {url}"
        assert status == o["status"]
        assert n_pages == o["n_pages"]


def test_job_matches_oracle(ray_session, corpus_dir, oracle_results, tmp_path):
    out = str(tmp_path / "out")
    summary = run_extraction_job(corpus_dir, out, CFG)
    assert summary["n_docs"] == N_ROWS
    assert summary["parse_failures"] > 0      # malformed fixtures present
    assert summary["empty_extractions"] > 0   # short/garbage fixtures present
    assert summary["truncations"] >= 1        # giant-blob fixtures present
    assert_matches_oracle(read_output(out), oracle_results)


def test_parallelism_levels_byte_identical(ray_session, corpus_dir, oracle_results, tmp_path):
    """The per-row invariant from BASELINE.json: byte-identical extracted
    text per url across parallelism levels (here: actor-pool sizes)."""
    out1 = str(tmp_path / "p1")
    out2 = str(tmp_path / "p2")
    # NB: autoscaling (min,max) pools — a fixed int pool can reserve every
    # CPU and starve the read stage (single-node deadlock).
    s1 = run_extraction_job(corpus_dir, out1, CFG, concurrency=(1, 1))
    s2 = run_extraction_job(corpus_dir, out2, CFG, concurrency=(1, 3))
    assert s1["content_hash"] == s2["content_hash"]
    t1, t2 = read_output(out1), read_output(out2)
    assert_matches_oracle(t1, oracle_results)
    assert_matches_oracle(t2, oracle_results)
    # Shard files are byte-stable: same sorted (url, doc_text) sequences.
    assert t1.sort_by("url").equals(t2.sort_by("url"))


def test_resume_skips_completed_shards(ray_session, corpus_dir, oracle_results, tmp_path):
    out_full = str(tmp_path / "full")
    run_extraction_job(corpus_dir, out_full, CFG)

    # Simulate a crash: keep only 3 completed shards (+ one torn write: data
    # file without lineage must be re-processed).
    out_part = str(tmp_path / "partial")
    os.makedirs(os.path.join(out_part, "data"))
    os.makedirs(os.path.join(out_part, "lineage"))
    done = sorted(lin.completed_shards(out_full))
    keep = done[:3]
    for sid in keep:
        d, l = lin.shard_paths(out_full, sid)
        shutil.copy(d, lin.shard_paths(out_part, sid)[0])
        shutil.copy(l, lin.shard_paths(out_part, sid)[1])
    torn = done[3]
    shutil.copy(lin.shard_paths(out_full, torn)[0], lin.shard_paths(out_part, torn)[0])
    # no lineage for `torn` -> incomplete

    assert lin.completed_shards(out_part) == set(keep)

    summary = run_extraction_job(corpus_dir, out_part, CFG, resume=True)
    assert summary["resumed_shards_skipped"] == 3
    assert summary["new_shards_written"] == CFG.n_shards - 3
    assert summary["n_docs"] == N_ROWS
    # Final output identical to the uninterrupted run.
    full = read_output(out_full).sort_by("url")
    part = read_output(out_part).sort_by("url")
    assert full.equals(part)


def test_lineage_validation_rejects_row_count_mismatch(ray_session, corpus_dir, tmp_path):
    out = str(tmp_path / "val")
    run_extraction_job(corpus_dir, out, CFG)
    done = sorted(lin.completed_shards(out))
    victim = done[0]
    dpath, _ = lin.shard_paths(out, victim)
    t = pq.read_table(dpath)
    pq.write_table(t.slice(0, max(0, t.num_rows - 1)), dpath)  # corrupt: drop a row
    assert victim not in lin.completed_shards(out)


def test_pages_dataset_explosion(ray_session, corpus_dir, oracle_results):
    import ray.data as rd

    from service1_text_extraction_ray.pipelines.extract_pipeline import read_pages

    pages = extract_pages_dataset(read_pages(corpus_dir), CFG).take_all()
    # One row per (url, page); page_md golden surface carried through.
    by_url = {}
    for r in pages:
        by_url.setdefault(r["url"], []).append(r)
    exp_total = sum(o["n_pages"] for o in oracle_results.values())
    assert len(pages) == exp_total
    for url, rows in by_url.items():
        o = oracle_results[url]
        rows.sort(key=lambda r: r["page"])
        assert [r["method"] for r in rows] == [p["method"] for p in o["pages"]]
        assert [r["page_md"] for r in rows] == [p["page_md"] for p in o["pages"]]


def test_extract_dataset_streaming_no_write(ray_session, corpus_dir):
    from service1_text_extraction_ray.pipelines.extract_pipeline import read_pages

    docs = extract_dataset(read_pages(corpus_dir), CFG)
    # consume via iter_batches (streaming), count rows
    n = 0
    for b in docs.iter_batches(batch_size=128, batch_format="pyarrow"):
        n += b.num_rows
        assert b.schema.field("doc_text").type == pa.string()
    assert n == N_ROWS
