"""Shared bench.py runner for the measurement scripts (corpus_cost,
round_compare, scaling_bench) — ONE definition of the invocation contract
(env assembly, last-line JSON parse, failure formatting), so a change to
bench.py's protocol cannot silently desynchronize the artifacts
(code-review r5)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(
    cwd: str = REPO,
    cpus: int | None = None,
    n_docs: int | None = None,
    compat: int | None = None,
    extraction_only: bool = False,
    timeout: int = 1800,
) -> dict:
    """Run ``{cwd}/bench.py`` in a fresh subprocess and parse its one-line
    JSON result. None-valued knobs inherit the ambient environment."""
    env = dict(os.environ)
    if cpus is not None:
        env["SPARK_GRAFT_CPUS"] = str(cpus)
    if n_docs is not None:
        env["BENCH_N_DOCS"] = str(n_docs)
    if compat is not None:
        env["SPARK_GRAFT_CORPUS_COMPAT"] = str(compat)
    if extraction_only:
        env["BENCH_EXTRACTION_ONLY"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.join(cwd, "bench.py")],
        env=env, capture_output=True, text=True, timeout=timeout, cwd=cwd,
    )
    if out.returncode != 0 or not out.stdout.strip():
        raise RuntimeError(
            f"bench.py failed (rc={out.returncode}) in {cwd}:\n"
            + out.stderr[-2000:]
        )
    # bench.py prints a detailed record line followed by a short headline
    # line (driver tail-window safety, VERDICT r6 "What's wrong" #1).
    # Merge every parseable JSON line, later lines winning — overlapping
    # scalar keys are identical; the detail line contributes the per-query
    # cpu dicts the compare scripts need.
    merged: dict = {}
    for line in out.stdout.strip().splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            merged.update(json.loads(line))
        except json.JSONDecodeError:
            continue
    if not merged:
        raise RuntimeError(f"bench.py printed no parseable JSON in {cwd}")
    return merged
