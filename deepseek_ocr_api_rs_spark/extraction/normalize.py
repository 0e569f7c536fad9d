"""Final text canonicalization.

Analogue of ``normalize_text`` in the reference
(crates/core/src/inference.rs:142-147): CRLF→LF, strip the end-of-sentence
sentinel, trim. Byte-compare targets run through this exact function on both
the golden and the Spark path.
"""

from __future__ import annotations

END_SENTINEL = "<｜end▁of▁sentence｜>"  # <｜end▁of▁sentence｜>


def normalize_text(text: str) -> str:
    # Reference semantics: replace ALL sentinel occurrences (not just a
    # suffix) — inference.rs:142-147 uses str::replace. Bare-\r → \n is a
    # deliberate extra hardening over the reference (which only folds CRLF).
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    return text.replace(END_SENTINEL, "").strip()
