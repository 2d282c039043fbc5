"""service1_text_extraction_ray — a Ray-Data-native main-content extraction engine.

A brand-new engine (NOT a port) with the query/data-processing capabilities of
the reference `nashrakhan-aithon/service1_text-extraction` service, re-expressed
Ray-Data-first:

- input: Parquet table of Common-Crawl-style pages
  ``(url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string)``
- job shape: ``ray.data.read_parquet`` -> vectorized sniff/bucketing ->
  actor-pool ``map_batches`` extraction (stdlib HTML DOM + from-scratch PDF
  subset parser) -> sharded Parquet writes with per-partition lineage records
  and counters (checkpoint-resume at shard granularity).

The extraction *semantics* (quality gates, fallback ladder, output formats)
mirror the reference's PDF processor — every threshold cited file:line into
/root/reference in the docstrings — while the execution engine is pure
Ray Data streaming.
"""

__version__ = "0.1.0"
