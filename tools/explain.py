"""Per-stage execution stats for any queries() entry.

Usage: python tools/explain.py <query> [sf_dir]

Runs the named pipeline, consumes it streamingly, and prints Ray Data's
per-operator wall-time / rows / memory breakdown (ds.stats()) — the
feedback loop the repo's perf work runs on ("read ds.stats() and iterate
until wall-time is dominated by useful compute").
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import os

    os.environ.setdefault("GRAFT_ORACLE_SF_DIR", sf_dir)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    res = E.queries()[name](sf_dir)
    if isinstance(res, rd.Dataset):
        n = 0
        for b in res.iter_batches(batch_size=8192, batch_format="pyarrow"):
            n += b.num_rows
        print(f"--- {name}: {n} rows ---")
        print(res.stats())
    else:
        print(f"--- {name}: {len(res)} rows (driver-side result, no Dataset stats) ---")
    ray.shutdown()


if __name__ == "__main__":
    main()
