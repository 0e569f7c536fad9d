"""Round-over-round CODE cost comparison (VERDICT r4 ask #7).

Wall-clock deltas between rounds are unfalsifiable on this shared box
(r3/r4 verdicts: same-code spread exceeds round deltas), so per-round
performance claims are made from task-CPU seconds at FIXED parallelism,
measured INTERLEAVED on the same box: the previous round's commit is
checked out into a temporary git worktree and bench.py alternates between
base and HEAD, pinned to the SAME corpus grammar
(``SPARK_GRAFT_CORPUS_COMPAT``) so the corpus effect is factored out
(that effect is measured separately by scripts/corpus_cost.py). Best-of-N
per side, per query. Writes BENCH/round_compare.json; scaling_bench.py
folds it into BENCH/BASELINE.md on its next run.

Usage: ROUND_BASE_REF=<prev-round-commit> python scripts/round_compare.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_common import REPO, run_bench as _run_bench  # noqa: E402


def run_bench(cwd: str, cpus: int, n_docs: int, compat: int) -> dict:
    return _run_bench(cwd=cwd, cpus=cpus, n_docs=n_docs, compat=compat)


def main() -> None:
    base_ref = os.environ.get("ROUND_BASE_REF", "a10ada8")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    n_docs = int(os.environ.get("BENCH_N_DOCS", "120000"))
    repeats = int(os.environ.get("BENCH_REPEATS", "2"))
    compat = int(os.environ.get("SPARK_GRAFT_CORPUS_COMPAT", "7"))
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, cwd=REPO, timeout=10,
    ).stdout.strip()

    wt = f"/tmp/round_base_{base_ref}"
    if os.path.exists(wt):
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt], cwd=REPO,
            capture_output=True,
        )
        shutil.rmtree(wt, ignore_errors=True)
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, base_ref],
        cwd=REPO, check=True, capture_output=True, text=True,
    )
    try:
        runs: dict[str, list[dict]] = {"base": [], "head": []}
        for r in range(repeats):
            order = (("base", wt), ("head", REPO))
            if r % 2:  # alternate: always-second is systematically
                order = order[::-1]  # disadvantaged on this shared box
            for side, cwd in order:
                res = run_bench(cwd, cpus, n_docs, compat)
                runs[side].append(res)
                print(
                    f"run {r} {side}: total cpu {res.get('cpu_sec_total')}s, "
                    f"extraction cpu {res.get('extraction_cpu_sec')}s, "
                    f"wall {res.get('value')}s",
                    flush=True,
                )
        names = sorted(
            set(runs["base"][0].get("queries_cpu_sec", {}))
            & set(runs["head"][0].get("queries_cpu_sec", {}))
        )
        per_query = {}
        for q in names:
            b = min(x["queries_cpu_sec"][q] for x in runs["base"])
            h = min(x["queries_cpu_sec"][q] for x in runs["head"])
            per_query[q] = {
                "base_cpu_sec": b,
                "head_cpu_sec": h,
                "ratio_head_over_base": round(h / b, 4) if b else None,
            }
        only_head = sorted(
            set(runs["head"][0].get("queries_cpu_sec", {})) - set(names)
        )
        total_b = min(x["cpu_sec_total"] for x in runs["base"])
        total_h = min(x["cpu_sec_total"] for x in runs["head"])
        # the COMPARABLE total: only queries both sides run — a round
        # that adds bench queries would otherwise inflate the head total
        # (apples-to-oranges; code-review r6)
        shared_b = min(
            sum(x["queries_cpu_sec"][q] for q in names) for x in runs["base"]
        )
        shared_h = min(
            sum(x["queries_cpu_sec"][q] for q in names) for x in runs["head"]
        )
        report = {
            "generated_at": datetime.now(timezone.utc).isoformat(
                timespec="seconds"
            ),
            "base_ref": base_ref,
            "head_ref": head,
            "cpus": cpus,
            "n_docs": n_docs,
            "corpus_compat": compat,
            "repeats": repeats,
            "cpu_sec_total_base": total_b,
            "cpu_sec_total_head": total_h,
            "cpu_ratio_head_over_base": round(total_h / total_b, 4),
            "cpu_sec_shared_base": round(shared_b, 3),
            "cpu_sec_shared_head": round(shared_h, 3),
            "cpu_ratio_shared": round(shared_h / shared_b, 4),
            "queries": per_query,
            "queries_only_in_head": only_head,
            "all_runs": runs,
        }
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "round_compare.json"), "w") as f:
            json.dump(report, f, indent=2)
        print(
            json.dumps({k: v for k, v in report.items() if k != "all_runs"})
        )
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt], cwd=REPO,
            capture_output=True,
        )


if __name__ == "__main__":
    main()
