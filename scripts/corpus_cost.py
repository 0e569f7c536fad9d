"""Quantify the corpus-v4 cost (VERDICT r3 #8): how much extraction
throughput the v4 grammar change (12.5% modern-PDF slice) costs relative to
v3, so future round-over-round docs/s deltas can subtract the corpus effect.

Runs bench.py (extraction-only) INTERLEAVED at SPARK_GRAFT_CORPUS_COMPAT=3
and =4 — same box, alternating, best-of-N per version — and compares on
extraction_cpu_sec (task-CPU, the load-noise-immune metric) with wall
docs/s recorded alongside. Writes BENCH/corpus_cost.json, which
scripts/scaling_bench.py folds into BENCH/BASELINE.md on its next run.
"""

from __future__ import annotations

import json
import os
import sys
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_common import REPO, run_bench as _run_bench  # noqa: E402


def run_bench(compat: int, n_docs: int, cpus: int) -> dict:
    return _run_bench(
        cpus=cpus, n_docs=n_docs, compat=compat,
        extraction_only=True, timeout=900,
    )


def main() -> None:
    n_docs = int(os.environ.get("BENCH_N_DOCS", "120000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    ver_a = int(os.environ.get("BENCH_COMPAT_A", "3"))
    ver_b = int(os.environ.get("BENCH_COMPAT_B", "4"))
    runs: dict[int, list[dict]] = {ver_a: [], ver_b: []}
    for r in range(repeats):
        for ver in (ver_a, ver_b):  # interleaved: load noise hits both versions
            res = run_bench(ver, n_docs, cpus)
            runs[ver].append(res)
            print(
                f"run {r} v{ver}: cpu {res['extraction_cpu_sec']}s, "
                f"wall {res['extraction_sec']}s, "
                f"{res['extraction_docs_per_sec']} docs/s",
                flush=True,
            )
    a, b = ver_a, ver_b
    best_cpu = {v: min(x["extraction_cpu_sec"] for x in runs[v]) for v in (a, b)}
    best_dps = {v: max(x["extraction_docs_per_sec"] for x in runs[v]) for v in (a, b)}
    report = {
        "generated_at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "n_docs": n_docs,
        "cpus": cpus,
        "repeats": repeats,
        f"cpu_sec_v{a}": best_cpu[a],
        f"cpu_sec_v{b}": best_cpu[b],
        f"cpu_ratio_v{b}_over_v{a}": round(best_cpu[b] / best_cpu[a], 4),
        f"docs_per_sec_v{a}": best_dps[a],
        f"docs_per_sec_v{b}": best_dps[b],
        f"wall_ratio_v{a}_over_v{b}": round(best_dps[a] / best_dps[b], 4),
        "all_runs": {str(k): v for k, v in runs.items()},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_name = (
        "corpus_cost.json" if (a, b) == (3, 4)
        else f"corpus_cost_v{a}_v{b}.json"
    )
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "all_runs"}))


if __name__ == "__main__":
    main()
