"""Full-headline scale audit: run EVERY bench headline query at sf0.1
and BOTH sf1 corpora, and print the time ratio per query:

- `.scaledata/sf1` — the 10x-UPSAMPLED replica corpus
  (tools/gen_scale_corpus.py): preserves per-replica workload
  structure, the honest scale point for the dedup family (near-dup
  density must grow linearly, not quadratically);
- `.scaledata/sf1_true` — the GENUINE corpus (tools/gen_true_sf1.py):
  fresh hash-seeded data, the honest scale point for SQL/graph/path
  queries (no artificial per-replica key uniformity).

The bench's sf_scale_probe covers 7 queries per run; this audits the
whole set for supra-linear scalers on both corpora.
Usage: PYTHONPATH=. python tools/scale_audit.py
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from agensgraph_spark import get_spark, workload  # noqa: E402

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    spark = get_spark("scale-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = workload.all_queries()
    replica_dir = os.path.join(_ROOT, ".scaledata", "sf1")
    true_dir = os.path.join(_ROOT, ".scaledata", "sf1_true")
    if not os.path.isdir(replica_dir):
        import gen_scale_corpus
        gen_scale_corpus.generate(spark, replica_dir)
    if not os.path.isdir(true_dir):
        import gen_true_sf1
        gen_true_sf1.generate(spark, true_dir)
    results: dict[str, dict[str, float]] = {}
    datasets = [("/root/testdata/sf0.1", "mid"),
                (replica_dir, "replica"), (true_dir, "true")]
    # one full untimed circuit over EVERY dataset first: JVM JIT tiering
    # keeps improving well past the first per-dataset warm pass, so the
    # first-measured dataset otherwise reads systematically slow (a
    # 10x-data ratio below 1.0 is the tell)
    for d, _ in datasets:
        for name in bench.HEADLINE:
            qs[name](spark, d).count()
    gc.collect()
    for d, tag in datasets:
        for name in bench.HEADLINE:       # per-dataset warm pass
            qs[name](spark, d).count()
        gc.collect()
        for name in bench.HEADLINE:       # timed pass
            t0 = time.time()
            qs[name](spark, d).count()
            results.setdefault(name, {})[tag] = round(time.time() - t0, 2)
        gc.collect()
    print(f"{'query':28s} {'sf0.1':>7s} {'sf1rep':>7s} {'sf1true':>8s} "
          "ratio_rep ratio_true  (10x data)")
    for name, r in sorted(results.items(),
                          key=lambda kv: -(kv[1]["true"] / max(kv[1]["mid"], 0.01))):
        mid = max(r["mid"], 0.01)
        print(f"{name:28s} {r['mid']:7.2f} {r['replica']:7.2f} "
              f"{r['true']:8.2f} {r['replica'] / mid:9.2f} "
              f"{r['true'] / mid:10.2f}")


if __name__ == "__main__":
    main()
