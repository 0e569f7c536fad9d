"""T1 template-registry analogue tests (conversation rendering pattern,
crates/core/tests/conversation_templates.rs:3-18)."""

from __future__ import annotations

import pytest

from deepseek_ocr_api_rs_spark.extraction.recipes import (
    DEFAULT_RECIPE,
    get_recipe,
    render_frame,
)


def test_registry_lookup():
    r = get_recipe("plain")
    assert r.langs is None and r.include_pdf


def test_unknown_recipe_errors():
    with pytest.raises(KeyError) as e:
        get_recipe("nope")
    assert "available" in str(e.value)


def test_render_frame():
    md = get_recipe("markdown")
    out = render_frame(md, "body text", "https://x/1")
    assert out == "# https://x/1\n\nbody text\n"
    plain = get_recipe(DEFAULT_RECIPE)
    assert render_frame(plain, "t", "u") == "t"


def test_lang_scoped_recipe():
    assert get_recipe("en-only").langs == ("en",)
