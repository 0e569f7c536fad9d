"""Extraction recipes — the T1 ConversationTemplate analogue.

The reference renders prompts through named templates
(crates/core/src/conversation/mod.rs:17-29, registry :166-191: plain /
deepseek / deepseekv2 / alignment). Our extraction equivalent is a named
RECIPE: a small config bundle selecting branch behavior and output framing.
Registry semantics mirror the reference: lookup by name, unknown name is an
error, default pinned.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ExtractionRecipe:
    name: str
    langs: tuple[str, ...] | None   # None = all languages
    include_pdf: bool
    block_separator: str
    frame: str                      # output framing: "{text}" with slots


_REGISTRY: dict[str, ExtractionRecipe] = {}


def register(recipe: ExtractionRecipe) -> None:
    _REGISTRY[recipe.name] = recipe


def get_recipe(name: str) -> ExtractionRecipe:
    """Lookup by name — unknown names raise (conversation/mod.rs:166-191
    errors on unknown template)."""
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown recipe {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def list_recipes() -> list[ExtractionRecipe]:
    """All registered recipes, name-sorted — the available_models()
    analogue backing GET /models (crates/server/src/routes.rs:26-47,
    state.rs available_models)."""
    return [_REGISTRY[k] for k in sorted(_REGISTRY)]


def render_frame(recipe: ExtractionRecipe, text: str, url: str) -> str:
    """Apply the output framing (render_prompt analogue,
    crates/core/src/inference.rs:124-137)."""
    return recipe.frame.format(text=text, url=url)


register(ExtractionRecipe("plain", None, True, "\n\n", "{text}"))
register(ExtractionRecipe("en-only", ("en",), True, "\n\n", "{text}"))
register(
    ExtractionRecipe(
        "markdown", None, True, "\n\n", "# {url}\n\n{text}\n"
    )
)
# r7: the third-backend recipe (crates/infer-dots analogue) — selects the
# plain-text/Markdown passthrough framing the `text` branch produces
# (extraction/markdown.py): no scorer, every paragraph block accepted.
register(ExtractionRecipe("dots-passthrough", None, False, "\n\n", "{text}"))
DEFAULT_RECIPE = "plain"
