"""Compute the queries() registration order for the driver CORRECTNESS window.

The driver samples the FIRST 50 registered queries each round for the full
oracle check (row count + schema + value hash). With 120+ registered queries
a single window cannot cover everything, so registration order is a rotation
schedule. Policy (VERDICT r7 asks #1/#4), applied per round boundary:

  1. NEW queries added this round (never had a chance at a driver row).
  2. Queries NEVER driver-certified in any CORRECTNESS_r*.json (the r7
     backlog: 13 session-4 registrations pushed these out before sampling).
  3. Queries whose implementation CHANGED this round (regression risk).
  4. Everything else, ascending by last-certified round (least-recently-
     certified first), ties broken by previous registration order.

Blocks 1-3 plus the head of block 4 fill the 50-row window; the rest queue
for the next rounds. Under this LRU policy every query earns a fresh driver
row at least once per ceil(n_queries / 50) rounds (= 3 at the current 130),
and never-certified / changed queries never wait.

Usage: python scripts/rotation_order.py  — prints the order, one name per
line, with the source block as a trailing comment. The order is then PINNED
statically in __spark_entry__.py:queries() (the driver must see a
deterministic registration; this script is the generator, not a runtime
dependency).
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Round-8 inputs to the policy (update these two lists each round).
NEW_THIS_ROUND: list[str] = [
    "q_corpus_build",
    "q_wds_roundtrip",
    "q_mixture_sample",
    "q_quality_tree",
    "q_semdedup",
    "q_warc_lookup",
]
CHANGED_THIS_ROUND: list[str] = [
    # scoped connected_components shuffles (VERDICT r7 #2)
    "q_canonical_docs",
    "q_dedup_pipeline",
    "q_dup_clusters",
]


def registered_queries() -> list[str]:
    src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    m = re.search(r"\ndef queries\(\).*?\n    return \{(.*?)\n    \}\n", src, re.S)
    return re.findall(r'"(q[\w]+)":', m.group(1))


def last_certified() -> dict[str, int]:
    """name -> last round with a green driver row (hash-exact, or rows-only
    for the documented no-oracle entries)."""
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name, row in json.load(open(f)).items():
            green = row.get("hash_match") or (
                row.get("rows_match") and row.get("err") in (None, "no_oracle")
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


def rotation_order() -> list[tuple[str, str]]:
    prev = registered_queries()
    for q in NEW_THIS_ROUND:
        if q not in prev:
            prev = [q] + prev  # new queries may not be registered yet
    pos = {q: i for i, q in enumerate(prev)}
    last = last_certified()

    new = [q for q in NEW_THIS_ROUND if q in pos]
    never = [
        q
        for q in prev
        if q not in last and q not in new and q not in CHANGED_THIS_ROUND
    ]
    # judge-prescribed lead: flagship first
    lead = "q_extract_html_pipeline"
    if lead in never:
        never = [lead] + [q for q in never if q != lead]
    changed = [q for q in CHANGED_THIS_ROUND if q in pos]
    rest = [q for q in prev if q not in new and q not in never and q not in changed]
    rest.sort(key=lambda q: (last.get(q, 0), pos[q]))

    out: list[tuple[str, str]] = []
    out += [(q, "new r8") for q in new]
    out += [(q, "never driver-certified (r7 backlog)") for q in never]
    out += [(q, "changed r8 (scoped CC shuffles)") for q in changed]
    out += [(q, f"last certified r{last.get(q, 0)}") for q in rest]
    return out


if __name__ == "__main__":
    order = rotation_order()
    for i, (q, why) in enumerate(order, 1):
        marker = " | IN WINDOW" if i <= 50 else ""
        print(f"{i:3d}  {q:40s} # {why}{marker}")
