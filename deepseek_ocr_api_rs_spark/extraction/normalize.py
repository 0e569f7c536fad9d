"""Final text canonicalization.

Analogue of ``normalize_text`` in the reference
(crates/core/src/inference.rs:142-147): CRLF→LF, strip the end-of-sentence
sentinel, trim. Byte-compare targets run through this exact function on both
the golden and the Spark path.
"""

from __future__ import annotations

END_SENTINEL = "<｜end▁of▁sentence｜>"  # <｜end▁of▁sentence｜>


def normalize_text(text: str) -> str:
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    if text.endswith(END_SENTINEL):
        text = text[: -len(END_SENTINEL)]
    return text.strip()
