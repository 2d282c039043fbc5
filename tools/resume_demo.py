"""Kill-and-resume demonstration at bench scale.

Runs the flagship job over the 200k-doc bench corpus three ways and prints
one JSON line:

1. clean:   fresh run to completion -> reference content_hash
2. killed:  fresh run SIGKILLed mid-flight (after --kill-after seconds)
3. resumed: `resume=True` over the killed run's output

Asserts: the resume skips every shard the killed run committed, re-processes
the rest, and the final job summary (counters + content hash) is byte-equal
to the clean run's — the crash-consistency contract of state/lineage.py at
a scale where hundreds of shards are in flight.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

KILL_AFTER = float(os.environ.get("RESUME_DEMO_KILL_AFTER", "12"))

_JOB_SNIPPET = """
import sys; sys.path.insert(0, {repo!r})
import json, ray
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from service1_text_extraction_ray.functions.extract import ExtractConfig
from service1_text_extraction_ray.pipelines.extract_pipeline import run_extraction_job
s = run_extraction_job({corpus!r}, {out!r}, ExtractConfig(), resume={resume})
print("SUMMARY " + json.dumps(s))
ray.shutdown()
"""


def run_job(corpus: str, out: str, resume: bool, kill_after: float | None = None):
    code = _JOB_SNIPPET.format(repo=REPO, corpus=corpus, out=out, resume=resume)
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        start_new_session=True,
    )
    if kill_after is not None:
        time.sleep(kill_after)
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
        return None
    out_text, _ = proc.communicate()
    for line in out_text.splitlines():
        if line.startswith("SUMMARY "):
            return json.loads(line[len("SUMMARY "):])
    raise RuntimeError(f"job produced no summary (rc={proc.returncode})")


def main() -> None:
    import shutil

    import ray

    import bench

    n_rows = bench._corpus_rows()
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    corpus = bench.ensure_corpus(n_rows)
    ray.shutdown()

    clean_out, crash_out = "/tmp/resume_demo_clean", "/tmp/resume_demo_crash"
    shutil.rmtree(clean_out, ignore_errors=True)
    shutil.rmtree(crash_out, ignore_errors=True)

    clean = run_job(corpus, clean_out, resume=False)

    run_job(corpus, crash_out, resume=False, kill_after=KILL_AFTER)
    from service1_text_extraction_ray.state import lineage as lin

    committed_at_kill = len(lin.load_lineage(crash_out))

    resumed = run_job(corpus, crash_out, resume=True)

    keys = ("n_docs", "n_pages", "parse_failures", "empty_extractions",
            "truncations", "password_required", "content_hash")
    match = all(clean[k] == resumed[k] for k in keys)
    print(json.dumps({
        "corpus_rows": clean["n_docs"],
        "n_shards": clean["n_shards"],
        "shards_committed_at_kill": committed_at_kill,
        "resumed_shards_skipped": resumed["resumed_shards_skipped"],
        "summary_matches_clean_run": match,
        "content_hash": clean["content_hash"],
        "kill_after_s": KILL_AFTER,
    }))
    if not match:
        sys.exit(1)


if __name__ == "__main__":
    main()
