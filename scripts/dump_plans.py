"""Dump .explain("formatted") for named declared queries to a directory.

Usage: python scripts/dump_plans.py <outdir> <suffix> q_a q_b ...
Writes <outdir>/<query><suffix>.txt  (suffix e.g. _before / _after).
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from deepseek_ocr_api_rs_spark.conf import build_session

    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        app_name="dump-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 4, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod
    from deepseek_ocr_api_rs_spark.operators.dedup import release_persisted

    qmap = entrymod.queries()
    for name in names:
        df = qmap[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        release_persisted()
        print("wrote", name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
