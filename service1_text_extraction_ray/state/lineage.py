"""Per-shard lineage records + checkpoint-resume substrate.

Replaces the reference's Postgres status bookkeeping (the 6 UPDATE helpers,
``document_text_extraction_service.py:715-846``, and the completed/pending
partial indexes, ``001_doc_text_extraction_queue.sql:76-83``) with per-shard
files next to the output data — the Ray-native equivalent at *partition*
granularity instead of per-document rows (SURVEY.md §2.1 S10, §4.2 item 3).

Layout under ``out_dir``::

    data/shard_{id:05d}.parquet      # the extraction rows of the shard
    lineage/shard_{id:05d}.json      # written strictly AFTER the data file

Write-then-commit ordering: the data file is written to a temp name and
renamed, then the lineage JSON is written to a temp name and renamed. A crash
between the two leaves data without lineage -> the shard is re-processed on
resume (idempotent: same shard -> same rows -> same bytes). Resume =
list the lineage dir, validate each record, and anti-join the completed
shard-id set against the input (a broadcast-set filter, not a shuffle).

The lineage record carries the counters the north star mandates
(parse_failures, empty_extractions, truncations) plus row counts and an
order-insensitive content hash (XOR of per-doc sha256 prefixes).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Set

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

LINEAGE_VERSION = 1


def data_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "data")


def lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "lineage")


def shard_paths(out_dir: str, shard_id: int) -> tuple[str, str]:
    return (
        os.path.join(data_dir(out_dir), f"shard_{shard_id:05d}.parquet"),
        os.path.join(lineage_dir(out_dir), f"shard_{shard_id:05d}.json"),
    )


def xor_content_hash(hashes: List[str]) -> str:
    """Order-insensitive 64-bit XOR of per-doc sha256 hex prefixes."""
    acc = 0
    for h in hashes:
        if h:
            acc ^= int(h[:16], 16)
    return f"{acc:016x}"


def build_lineage_record(shard_id: int, table: pa.Table, wall_ms: int) -> Dict[str, Any]:
    status = table["status"]
    return {
        "version": LINEAGE_VERSION,
        "shard_id": shard_id,
        "n_docs": table.num_rows,
        "n_pages": pc.sum(table["n_pages"]).as_py() or 0,
        "n_pages_ok": pc.sum(table["n_pages_ok"]).as_py() or 0,
        "parse_failures": pc.sum(
            pc.cast(pc.equal(status, "parse_failure"), pa.int64())
        ).as_py() or 0,
        "empty_extractions": pc.sum(
            pc.cast(pc.equal(table["doc_chars"], 0), pa.int64())
        ).as_py() or 0,
        "truncations": pc.sum(pc.cast(table["truncated"], pa.int64())).as_py() or 0,
        "content_hash": xor_content_hash(table["content_hash"].to_pylist()),
        "wall_ms": wall_ms,
        "status": "ok",
    }


def write_shard(out_dir: str, shard_id: int, table: pa.Table, wall_ms: int) -> Dict[str, Any]:
    """Atomically write one shard's data then its lineage record."""
    dpath, lpath = shard_paths(out_dir, shard_id)
    os.makedirs(os.path.dirname(dpath), exist_ok=True)
    os.makedirs(os.path.dirname(lpath), exist_ok=True)

    tmp = dpath + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, dpath)

    record = build_lineage_record(shard_id, table, wall_ms)
    tmp = lpath + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(record, f, sort_keys=True)
    os.replace(tmp, lpath)
    return record


def load_lineage(out_dir: str) -> List[Dict[str, Any]]:
    ldir = lineage_dir(out_dir)
    if not os.path.isdir(ldir):
        return []
    records = []
    for name in sorted(os.listdir(ldir)):
        if not (name.startswith("shard_") and name.endswith(".json")):
            continue
        path = os.path.join(ldir, name)
        try:
            with open(path, encoding="utf-8") as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue  # torn write -> treat shard as incomplete
        if rec.get("status") == "ok" and rec.get("version") == LINEAGE_VERSION:
            records.append(rec)
    return records


def completed_shards(out_dir: str, validate_data: bool = True) -> Set[int]:
    """Shard ids whose lineage record is valid AND whose data file exists with
    the recorded row count (guards against a crash that removed/corrupted the
    data after lineage was read in a previous resume)."""
    done: Set[int] = set()
    for rec in load_lineage(out_dir):
        sid = rec["shard_id"]
        dpath, _ = shard_paths(out_dir, sid)
        if validate_data:
            try:
                meta = pq.ParquetFile(dpath).metadata
            except (OSError, pa.ArrowInvalid):
                continue
            if meta.num_rows != rec["n_docs"]:
                continue
        done.add(sid)
    return done


def summarize(records: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Merge per-shard lineage into the job-level counter summary."""
    out = {
        "n_shards": len(records),
        "n_docs": 0,
        "n_pages": 0,
        "n_pages_ok": 0,
        "parse_failures": 0,
        "empty_extractions": 0,
        "truncations": 0,
    }
    acc = 0
    for r in records:
        out["n_docs"] += r["n_docs"]
        out["n_pages"] += r["n_pages"]
        out["n_pages_ok"] += r["n_pages_ok"]
        out["parse_failures"] += r["parse_failures"]
        out["empty_extractions"] += r["empty_extractions"]
        out["truncations"] += r["truncations"]
        acc ^= int(r["content_hash"], 16)
    out["content_hash"] = f"{acc:016x}"
    return out
