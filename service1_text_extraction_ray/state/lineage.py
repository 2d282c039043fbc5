"""Per-shard lineage records + checkpoint-resume substrate.

Replaces the reference's Postgres status bookkeeping (the 6 UPDATE helpers,
``document_text_extraction_service.py:715-846``, and the completed/pending
partial indexes, ``001_doc_text_extraction_queue.sql:76-83``) with
manifest-committed output files — the Ray-native equivalent at *partition*
granularity instead of per-document rows (SURVEY.md §2.1 S10, §4.2 item 3).

Layout under ``out_dir``::

    data/shard={id}/part-{contenthash}.parquet   # extraction rows (appended
                                                 #   by extraction tasks,
                                                 #   NO keyed shuffle)
    lineage/shard_{id:05d}.json                  # manifest: the exact part
                                                 #   list + counters; written
                                                 #   strictly AFTER its parts

Why parts + manifests instead of one file per shard: writing one file per
shard requires an all-to-all shuffle of the (heavy) extraction output to
co-locate each shard's rows. Instead, every extraction task writes the rows
it already holds, split by shard, as content-addressed part files — zero
data movement — and only the tiny per-(block, shard) summaries flow into a
groupby(shard_id) barrier that commits each shard's manifest once all its
parts exist. A reader trusts ONLY parts listed in a committed manifest, so:

- crash before a shard's manifest -> shard incomplete -> fully re-processed
  on resume; any orphan parts from the crashed attempt are simply never
  referenced (and re-writes of identical row-sets are idempotent because
  part names are content hashes);
- resume = validate manifests, broadcast the completed shard-id set, filter
  *before* the expensive parse stage (anti-join, not a shuffle).

The manifest carries the counters the north star mandates (parse_failures,
empty_extractions, truncations) plus row counts and an order-insensitive
content hash (XOR of per-doc sha256 prefixes).
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


def shard_data_dir(out_dir: str, shard_id: int) -> str:
    return os.path.join(data_dir(out_dir), f"shard={shard_id}")


def manifest_path(out_dir: str, shard_id: int) -> str:
    return os.path.join(lineage_dir(out_dir), f"shard_{shard_id:05d}.json")


def pending_dir(out_dir: str, shard_id: int) -> str:
    """Per-shard scratch of part-summary JSONs, written after each data part.
    Enables *incremental* manifest commits mid-run: once the summaries'
    row-count total reaches the shard's expected input rows, the shard is
    complete and its manifest can be committed immediately — a kill at T
    preserves every shard finished before T (FIXTURES.md §4 item 4).

    NB: the completeness check scans this directory, so writers of one shard
    must share a filesystem. That holds in local mode and on shared-FS/object
    -store clusters; without it, the end-of-stream ManifestCommitter barrier
    (which needs no shared view) still commits every shard."""
    return os.path.join(lineage_dir(out_dir), "pending", f"shard_{shard_id}")


def xor_content_hash(hashes: List[str]) -> str:
    """Order-insensitive 64-bit XOR of per-doc sha256 hex prefixes."""
    acc = 0
    for h in hashes:
        if h:
            acc ^= int(h[:16], 16)
    return f"{acc:016x}"


def part_counters(table: pa.Table) -> Dict[str, Any]:
    """Per-part counter summary (vectorized Arrow kernels)."""
    status = table["status"]
    return {
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
        "password_required": pc.sum(
            pc.cast(table["password_required"], pa.int64())
        ).as_py() or 0,
        "content_hash": xor_content_hash(table["content_hash"].to_pylist()),
    }


def write_part(out_dir: str, shard_id: int, table: pa.Table) -> Dict[str, Any]:
    """Write one content-addressed part file for a shard (atomic rename).

    The part name is a hash of the row-set's (url, content_hash) pairs, so a
    re-write of the same rows lands on the same name — idempotent by
    construction. Returns the part's summary record.
    """
    import hashlib

    h = hashlib.sha256()
    for url, ch in zip(table["url"].to_pylist(), table["content_hash"].to_pylist()):
        h.update(url.encode("utf-8"))
        h.update(ch.encode("ascii"))
    part_name = f"part-{h.hexdigest()[:20]}.parquet"

    ddir = shard_data_dir(out_dir, shard_id)
    os.makedirs(ddir, exist_ok=True)
    dpath = os.path.join(ddir, part_name)
    tmp = dpath + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, dpath)

    rec = part_counters(table)
    rec["shard_id"] = shard_id
    rec["part"] = part_name

    # Record the part summary under pending/ (atomic) so completeness is
    # checkable mid-run.
    pdir = pending_dir(out_dir, shard_id)
    os.makedirs(pdir, exist_ok=True)
    spath = os.path.join(pdir, part_name.replace(".parquet", ".json"))
    tmp = spath + f".tmp-{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(rec, f, sort_keys=True)
    os.replace(tmp, spath)
    return rec


def load_pending(out_dir: str, shard_id: int) -> list:
    pdir = pending_dir(out_dir, shard_id)
    if not os.path.isdir(pdir):
        return []
    out = []
    for name in sorted(os.listdir(pdir)):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(pdir, name), encoding="utf-8") as f:
                out.append(json.load(f))
        except (OSError, json.JSONDecodeError):
            continue  # torn write; the data part exists but isn't countable yet
    return out


def try_commit_shard(out_dir: str, shard_id: int, expected_rows: int) -> Dict[str, Any] | None:
    """Commit the shard's manifest iff all expected rows' parts are visible.

    Safe under concurrent writers: only the writer that observes the complete
    set commits; racing double-commits write identical content (sorted part
    list over the same complete set)."""
    pend = load_pending(out_dir, shard_id)
    if sum(r["n_docs"] for r in pend) != expected_rows:
        return None
    return commit_shard_manifest(out_dir, shard_id, pend)


def purge_shard(out_dir: str, shard_id: int) -> None:
    """Remove a shard's data parts, pending summaries and manifest — used
    before re-processing an incomplete shard so stale parts from a crashed
    attempt can never mix into the new attempt's completeness count."""
    import shutil

    for path in (shard_data_dir(out_dir, shard_id), pending_dir(out_dir, shard_id)):
        shutil.rmtree(path, ignore_errors=True)
    try:
        os.remove(manifest_path(out_dir, shard_id))
    except OSError:
        pass


def commit_shard_manifest(out_dir: str, shard_id: int, part_records: list) -> Dict[str, Any]:
    """Write the shard manifest AFTER all its parts exist (the commit point)."""
    parts = sorted({r["part"] for r in part_records})
    acc = 0
    record = {
        "version": LINEAGE_VERSION,
        "shard_id": shard_id,
        "parts": parts,
        "n_docs": 0,
        "n_pages": 0,
        "n_pages_ok": 0,
        "parse_failures": 0,
        "empty_extractions": 0,
        "truncations": 0,
        "password_required": 0,
        "status": "ok",
    }
    for r in part_records:
        record["n_docs"] += r["n_docs"]
        record["n_pages"] += r["n_pages"]
        record["n_pages_ok"] += r["n_pages_ok"]
        record["parse_failures"] += r["parse_failures"]
        record["empty_extractions"] += r["empty_extractions"]
        record["truncations"] += r["truncations"]
        record["password_required"] += r.get("password_required", 0)
        acc ^= int(r["content_hash"], 16)
    record["content_hash"] = f"{acc:016x}"

    lpath = manifest_path(out_dir, shard_id)
    os.makedirs(os.path.dirname(lpath), exist_ok=True)
    tmp = lpath + f".tmp-{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(record, f, sort_keys=True)
    os.replace(tmp, lpath)
    return record


def thread_map(fn, items, max_workers: int = 32) -> list:
    """Map an IO-bound fn over items with a bounded thread pool, preserving
    order. Shared by every O(shards) footer/metadata scan (a serial loop is
    a driver stall at crawl-scale shard counts)."""
    from concurrent.futures import ThreadPoolExecutor

    items = list(items)
    if not items:
        return []
    with ThreadPoolExecutor(max_workers=min(max_workers, max(4, len(items)))) as pool:
        return list(pool.map(fn, items))


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
    """Shard ids whose manifest is valid AND whose listed parts all exist with
    the recorded total row count (guards against data removed/corrupted after
    the manifest was committed).

    Validation is footer-only IO per part and independent across shards, so
    it runs through thread_map — a serial scan is an O(shards) resume stall
    at crawl-scale shard counts (same fix as the job's expected-rows scan)."""
    records = load_lineage(out_dir)
    if not validate_data:
        return {rec["shard_id"] for rec in records}

    def check(rec: Dict[str, Any]) -> int | None:
        sid = rec["shard_id"]
        ddir = shard_data_dir(out_dir, sid)
        n = 0
        for part in rec.get("parts", []):
            try:
                n += pq.ParquetFile(os.path.join(ddir, part)).metadata.num_rows
            except (OSError, pa.ArrowInvalid):
                return None
        return sid if n == rec["n_docs"] else None

    return {sid for sid in thread_map(check, records) if sid is not None}


def read_shard(out_dir: str, shard_id: int) -> pa.Table:
    """Read a shard's rows via its manifest (ignores orphan parts)."""
    rec_by_id = {r["shard_id"]: r for r in load_lineage(out_dir)}
    rec = rec_by_id[shard_id]
    ddir = shard_data_dir(out_dir, shard_id)
    tables = [pq.read_table(os.path.join(ddir, p)) for p in rec["parts"]]
    return pa.concat_tables(tables) if tables else pa.table({})


def read_all(out_dir: str) -> pa.Table:
    """Read every committed shard's rows (manifest-listed parts only)."""
    tables = []
    for rec in load_lineage(out_dir):
        ddir = shard_data_dir(out_dir, rec["shard_id"])
        for p in rec["parts"]:
            tables.append(pq.read_table(os.path.join(ddir, p)))
    return pa.concat_tables(tables) if tables else pa.table({})


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
        "password_required": 0,
    }
    acc = 0
    for r in records:
        out["n_docs"] += r["n_docs"]
        out["n_pages"] += r["n_pages"]
        out["n_pages_ok"] += r["n_pages_ok"]
        out["parse_failures"] += r["parse_failures"]
        out["empty_extractions"] += r["empty_extractions"]
        out["truncations"] += r["truncations"]
        out["password_required"] += r.get("password_required", 0)
        acc ^= int(r["content_hash"], 16)
    out["content_hash"] = f"{acc:016x}"
    return out


def compact_shard(out_dir: str, shard_id: int, target_rows: int = 100_000) -> Dict[str, Any]:
    """Small-file compaction for one committed shard — the storage-
    maintenance pass every long-lived 100-TB layout needs (many appends ->
    many tiny parts -> footer-read amplification on every consumer).

    Merges the shard's manifest-listed parts into ``ceil(n_docs /
    target_rows)`` right-sized parts. Crash-safe by the same commit
    discipline as extraction: new content-addressed parts are written
    FIRST, then the manifest atomically re-points to them, and only then
    are the old parts unlinked — a crash at any step leaves either the old
    or the new manifest, each referencing only parts that exist (orphans
    are never read). Counters and the order-insensitive content_hash are
    preserved exactly (asserted here, not assumed); already-compact shards
    are a no-op, and re-running lands on identical content-addressed names.
    Returns the (possibly unchanged) manifest record."""
    rec_by_id = {r["shard_id"]: r for r in load_lineage(out_dir)}
    rec = rec_by_id[shard_id]
    n_new = max(1, -(-rec["n_docs"] // target_rows))
    if len(rec["parts"]) <= n_new:
        return rec  # already compact

    table = read_shard(out_dir, shard_id)
    old_parts = set(rec["parts"])
    new_records = []
    step = -(-table.num_rows // n_new)
    for start in range(0, table.num_rows, step):
        new_records.append(
            write_part(out_dir, shard_id, table.slice(start, step))
        )
    new_rec = commit_shard_manifest(out_dir, shard_id, new_records)
    if new_rec["content_hash"] != rec["content_hash"] or new_rec["n_docs"] != rec["n_docs"]:
        raise RuntimeError(
            f"compaction changed shard {shard_id} content "
            f"({rec['content_hash']}/{rec['n_docs']} -> "
            f"{new_rec['content_hash']}/{new_rec['n_docs']})"
        )
    # old parts are now unreferenced; unlink them and their pending records
    ddir = shard_data_dir(out_dir, shard_id)
    pdir = pending_dir(out_dir, shard_id)
    keep = set(new_rec["parts"])
    for part in old_parts - keep:
        for path in (
            os.path.join(ddir, part),
            os.path.join(pdir, part.replace(".parquet", ".json")),
        ):
            try:
                os.remove(path)
            except OSError:
                pass
    return new_rec


def compact_output(out_dir: str, target_rows: int = 100_000) -> Dict[str, Any]:
    """Compact every committed shard (thread-pooled: compaction is IO-bound
    and shards are independent). Returns the job summary over the resulting
    manifests — byte-identical counters/content_hash to pre-compaction."""
    records = load_lineage(out_dir)
    thread_map(
        lambda r: compact_shard(out_dir, r["shard_id"], target_rows), records
    )
    return summarize(load_lineage(out_dir))
