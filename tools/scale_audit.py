"""Full-headline scale audit: run EVERY bench headline query at sf0.1
and the 10x-upsampled sf1 corpus (tools/gen_scale_corpus.py) and print
the time ratio per query. The bench's sf_scale_probe covers only the
top-5 most expensive queries per run; this audits the whole set for
supra-linear scalers. Usage: PYTHONPATH=. python tools/scale_audit.py
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from agensgraph_spark import get_spark, workload  # noqa: E402


def main() -> None:
    spark = get_spark("scale-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = workload.all_queries()
    big_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".scaledata", "sf1")
    if not os.path.isdir(big_dir):
        import gen_scale_corpus
        gen_scale_corpus.generate(spark, big_dir)
    results: dict[str, dict[str, float]] = {}
    for d, tag in [("/root/testdata/sf0.1", "mid"), (big_dir, "big")]:
        for name in bench.HEADLINE:       # warm pass: codegen + footers
            qs[name](spark, d).count()
        gc.collect()
        for name in bench.HEADLINE:       # timed pass
            t0 = time.time()
            qs[name](spark, d).count()
            results.setdefault(name, {})[tag] = round(time.time() - t0, 2)
        gc.collect()
    print(f"{'query':28s} {'sf0.1':>7s} {'sf1':>7s} ratio(10x data)")
    for name, r in sorted(results.items(),
                          key=lambda kv: -(kv[1]["big"] / max(kv[1]["mid"], 0.01))):
        print(f"{name:28s} {r['mid']:7.2f} {r['big']:7.2f} "
              f"{r['big'] / max(r['mid'], 0.01):6.2f}")


if __name__ == "__main__":
    main()
