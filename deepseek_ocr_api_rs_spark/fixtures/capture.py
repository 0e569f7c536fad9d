"""Golden capture — run the scalar reference extractor over the fixture
corpus and persist goldens (the analogue of ``scripts/capture_baseline.py``
persisting result.mmd / prompt.json / *.npz, baselines/README.md:1-168).

Outputs:
- ``golden_extractions.parquet`` (FIXTURES.md §2): url, extracted_text,
  branch, n_chars, n_blocks_total, n_blocks_accepted, schema_version
- ``golden_blocks.parquet``      (FIXTURES.md §3): url, block_idx, tag_path,
  features, score, accepted, block_text

Regenerated only by this script, never edited by hand
(baselines/README.md:7-9 precedent: capture overwrites its output dir).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from deepseek_ocr_api_rs_spark import SCHEMA_VERSION
from deepseek_ocr_api_rs_spark.extraction.reference import extract_document
from deepseek_ocr_api_rs_spark.fixtures.corpus import make_documents


def capture(out_dir: str, n_rows: int = 300) -> None:
    os.makedirs(out_dir, exist_ok=True)
    docs = make_documents(n_rows)
    ext_rows = []
    block_rows = []
    for url, payload in zip(docs.url, docs.html):
        res = extract_document(payload)
        ext_rows.append(
            (
                url,
                res.extracted_text,
                res.branch,
                res.n_chars,
                res.n_blocks_total,
                res.n_blocks_accepted,
                res.span_starts,
                res.span_ends,
                res.truncated,
                SCHEMA_VERSION,
            )
        )
        for t in res.blocks:
            block_rows.append(
                (url, t.block_idx, t.tag_path, t.features, t.score, t.accepted, t.block_text)
            )
    ext = pd.DataFrame(
        ext_rows,
        columns=[
            "url", "extracted_text", "branch", "n_chars",
            "n_blocks_total", "n_blocks_accepted",
            "span_starts", "span_ends", "truncated", "schema_version",
        ],
    )
    blocks = pd.DataFrame(
        block_rows,
        columns=["url", "block_idx", "tag_path", "features", "score", "accepted", "block_text"],
    )
    pq.write_table(
        pa.Table.from_pandas(ext, preserve_index=False),
        os.path.join(out_dir, "golden_extractions.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(blocks, preserve_index=False),
        os.path.join(out_dir, "golden_blocks.parquet"),
    )


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "tests/goldens"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    capture(out, n)
    print(f"goldens written to {out} (n={n}, schema_version={SCHEMA_VERSION})")
