"""The flagship extraction pipeline as a streaming ray.data graph.

Replaces the reference's FastAPI/Postgres/asyncio plumbing
(``document_text_extraction_service.py:226-360`` fan-out,
``:405-605`` per-doc stage chain) with::

    read_parquet(columns pruned)
      -> map_batches(SniffStage)                # vectorized kind/size/shard tagging
      -> [resume anti-join: broadcast completed-shard set, pc.is_in filter]
      -> map_batches(ExtractDocuments,          # actor pool, Arrow in/out
                     batch_size=small, concurrency=pool)
      -> groupby(shard_id).map_groups(ShardWriter)   # the ONE keyed shuffle:
                                                # deterministic shard ownership,
                                                # write-then-commit lineage
      -> tiny per-shard summary dataset (the only thing the driver collects)

Design notes (SURVEY.md §4.2):

- **Streaming**: nothing materializes the full dataset; the driver only ever
  collects the per-shard summary rows (one small row per shard).
- **Skew**: small parse batch_size bounds giant-doc co-travel; payload
  truncation guard is counted per shard. The shard shuffle key is
  ``crc32(url) % n_shards`` — uniform by construction; at 100 TB raise
  ``n_shards`` so a shard stays ~object-store-block sized.
- **Resume**: shard ownership is a pure function of the url, so a resumed run
  recomputes exactly the missing shards; completed-shard filtering happens
  *before* the expensive parse stage.
- **No-write mode** (``extract_dataset``): the same graph minus the shuffle +
  writer, for callers that want the doc-grain Dataset to keep composing
  (e.g. the driver's queries()).
"""

from __future__ import annotations

import time
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.extract import ExtractConfig
from ..stages.extract_stage import ExtractDocuments, SniffStage, explode_pages
from ..state import lineage as lin

# Input columns the extraction graph actually needs — never read text/lang
# payload-adjacent columns we don't use (prune at the read).
INPUT_COLUMNS = ["url", "warc_ts", "html", "lang"]

# Parse-stage sizing: per-doc cost variance is huge (1-page HTML vs 8-page
# PDF vs truncated giant), so keep batches small (SURVEY.md §4.2 item 2).
PARSE_BATCH_SIZE = 32


def read_pages(input_path: str) -> rd.Dataset:
    """Read the pages table with column pruning."""
    return rd.read_parquet(input_path, columns=INPUT_COLUMNS)


def _prepare_session() -> None:
    """Ship package code by value so workers never need the repo on sys.path."""
    import service1_text_extraction_ray as pkg

    pkg.ensure_worker_importable()


def extract_dataset(
    ds: rd.Dataset,
    cfg: Optional[ExtractConfig] = None,
    concurrency: Optional[int] = None,
    skip_shards: Optional[set] = None,
) -> rd.Dataset:
    """Sniff + (optional resume filter) + actor-pool extraction.

    Returns the doc-grain Dataset (DOC_SCHEMA) without writing — fully lazy.
    """
    cfg = cfg or ExtractConfig()
    _prepare_session()
    ds = ds.map_batches(SniffStage(cfg), batch_format="pyarrow")

    if skip_shards:
        skip = pa.array(sorted(skip_shards), type=pa.int32())

        def _filter_done(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(pc.is_in(batch["shard_id"], value_set=skip)))

        ds = ds.map_batches(_filter_done, batch_format="pyarrow")

    if concurrency is None:
        # Autoscaling actor pool sized to the cluster: leave headroom for the
        # read and write stages so the pipeline never serializes on one pool.
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (1, max(2, ncpu - 1))
    return ds.map_batches(
        ExtractDocuments,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=PARSE_BATCH_SIZE,
        zero_copy_batch=True,
        num_cpus=1,
        concurrency=concurrency,
    )


def extract_pages_dataset(ds: rd.Dataset, cfg: Optional[ExtractConfig] = None, **kw) -> rd.Dataset:
    """Page-grain flat view of the extraction (no shuffle)."""
    return extract_dataset(ds, cfg, **kw).map_batches(explode_pages, batch_format="pyarrow")


class ShardWriter:
    """Per-shard sink: one parquet file + one lineage record per shard group,
    write-then-commit ordering (state/lineage.py). Emits a one-row summary."""

    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        # map_groups expects a plain function-like object (reads __name__).
        self.__name__ = "ShardWriter"

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        shard_id = group["shard_id"][0].as_py()
        # Deterministic within-shard order (url is unique) so shard files are
        # byte-stable across runs and parallelism levels.
        group = group.sort_by("url")
        wall_ms = int((time.monotonic() - t0) * 1000)
        rec = lin.write_shard(self.out_dir, shard_id, group, wall_ms)
        return pa.Table.from_pylist(
            [
                {
                    "shard_id": rec["shard_id"],
                    "n_docs": rec["n_docs"],
                    "n_pages": rec["n_pages"],
                    "parse_failures": rec["parse_failures"],
                    "empty_extractions": rec["empty_extractions"],
                    "truncations": rec["truncations"],
                    "content_hash": rec["content_hash"],
                }
            ]
        )


def run_extraction_job(
    input_path: str,
    out_dir: str,
    cfg: Optional[ExtractConfig] = None,
    resume: bool = False,
    concurrency: Optional[int] = None,
) -> dict:
    """End-to-end job: read -> sniff -> [resume filter] -> extract -> sharded
    write with lineage. Returns the job summary (counters merged across
    shards, including previously-completed ones on resume)."""
    cfg = cfg or ExtractConfig()

    skip = lin.completed_shards(out_dir) if resume else set()

    ds = read_pages(input_path)
    docs = extract_dataset(ds, cfg, concurrency=concurrency, skip_shards=skip)

    summary_ds = docs.groupby("shard_id").map_groups(
        ShardWriter(out_dir), batch_format="pyarrow"
    )
    # The summary is tiny (one row per shard): collecting it is the stream sink.
    new_records = summary_ds.take_all()

    all_records = lin.load_lineage(out_dir)
    summary = lin.summarize(all_records)
    summary["resumed_shards_skipped"] = len(skip)
    summary["new_shards_written"] = len(new_records)
    return summary
