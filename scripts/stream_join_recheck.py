"""Focused re-measure of q_stream_click_purchase_join (VERDICT r5 ask #7).

The r5 round_compare table showed a 1.26 cpu ratio for this query on ONE
interleaved leg (3.0 -> 3.8 cpu-s) — flagged as probable interleaving-
order noise, with re-measurement as the arbiter. This script is the
round_compare ADDENDUM: it times ONLY this query, base commit vs HEAD,
alternating N times per side in fresh JVMs at fixed cpus, and reports
best-of cpu + wall per side. Runs SEQUENTIALLY — never alongside other
Spark work (BENCH/BASELINE.md comparison discipline).

Usage: STREAM_BASE_REF=<commit> python scripts/stream_join_recheck.py
Writes BENCH/stream_join_recheck.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_common import REPO  # noqa: E402

_PROBE = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from deepseek_ocr_api_rs_spark.conf import build_session
import __spark_entry__ as entrymod
import bench

cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = build_session(
    app_name="stream-join-recheck",
    master=f"local[{cpus}]",
    shuffle_partitions=max(int(cpus) * 4, 32),
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm
q = entrymod.queries()["q_stream_click_purchase_join"]
q(spark, sf_dir).collect()  # warm run: state-store dirs, codegen, workers
cpu0 = bench._settled_cum_task_seconds(spark)[0]
t0 = time.time()
q(spark, sf_dir).collect()
wall = time.time() - t0
cpu = bench._settled_cum_task_seconds(spark)[0] - cpu0
print(json.dumps({"wall": round(wall, 3), "cpu": round(cpu, 3)}))
spark.stop()
"""


def probe(cwd: str, cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    r = subprocess.run(
        [sys.executable, "-c", _PROBE],
        env=env, capture_output=True, text=True, timeout=600, cwd=cwd,
    )
    if r.returncode != 0:
        raise RuntimeError(f"probe failed in {cwd}:\n{r.stderr[-2000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    base_ref = os.environ.get("STREAM_BASE_REF", "a10ada8")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    repeats = int(os.environ.get("BENCH_REPEATS", "4"))
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, cwd=REPO, timeout=10,
    ).stdout.strip()

    wt = f"/tmp/stream_base_{base_ref}"
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
            if r % 2:  # alternate so always-second bias cancels
                order = tuple(reversed(order))
            for side, cwd in order:
                res = probe(cwd, cpus)
                runs[side].append(res)
                print(f"run {r} {side}: cpu {res['cpu']}s wall {res['wall']}s",
                      flush=True)
        best = {s: min(x["cpu"] for x in runs[s]) for s in ("base", "head")}
        bwall = {s: min(x["wall"] for x in runs[s]) for s in ("base", "head")}
        report = {
            "generated_at": datetime.now(timezone.utc).isoformat(
                timespec="seconds"
            ),
            "query": "q_stream_click_purchase_join",
            "base_ref": base_ref,
            "head_ref": head,
            "cpus": cpus,
            "repeats": repeats,
            "cpu_sec_base": best["base"],
            "cpu_sec_head": best["head"],
            "cpu_ratio_head_over_base": round(best["head"] / best["base"], 4),
            "wall_sec_base": bwall["base"],
            "wall_sec_head": bwall["head"],
            "all_runs": runs,
            "note": (
                "round_compare addendum (VERDICT r5 ask #7): focused 4-run "
                "interleave, warm run excluded, best-of per side"
            ),
        }
        out = os.path.join(REPO, "BENCH", "stream_join_recheck.json")
        with open(out, "w") as fh:
            json.dump(report, fh, indent=2)
        print(json.dumps({k: v for k, v in report.items() if k != "all_runs"}))
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt], cwd=REPO,
            capture_output=True,
        )
        shutil.rmtree(wt, ignore_errors=True)


if __name__ == "__main__":
    main()
