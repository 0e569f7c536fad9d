"""Per-query isolation bench (guide §1.4) — NOT the driver contract.

Times a named subset of the declared queries exactly the way bench.py
does (same session config, collect() action, release_persisted between),
so individual optimizations can be A/B'd without paying a full suite run.
Usage: python bench_extra.py q_a q_b ...   [repeats via BENCH_EXTRA_REPEATS]
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from deepseek_ocr_api_rs_spark.conf import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("BENCH_EXTRA_REPEATS", "2"))
    names = sys.argv[1:]
    spark = build_session(
        app_name=f"bench-extra-local[{cpus}]",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 4, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    import __spark_entry__ as entrymod
    from deepseek_ocr_api_rs_spark.operators.dedup import release_persisted

    qmap = entrymod.queries()
    out: dict[str, list[float]] = {}
    for r in range(repeats):
        for name in names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            qmap[name](spark, sf_dir).collect()
            out.setdefault(name, []).append(round(time.time() - t0, 3))
            release_persisted()
    print(json.dumps({k: {"samples": v, "min": min(v)} for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
