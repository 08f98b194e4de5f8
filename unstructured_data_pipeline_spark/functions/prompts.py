"""Prompt-schema normalization (pure logic, AI6 in SURVEY.md section 2.9).

The reference canonicalizes arbitrary stored JSON into either a
``{field: question}`` dict or a 2-element ``["q", question]`` list, with a
class-specific fallback (`app/Auto-Magic Document AI.py:162-183`).  The
semantics re-implemented here (not copied):

* a dict of string->string            -> kept as {field: question}
* a dict wrapping a single class name -> unwrapped one level
  (``{"invoice": {"total": "..."}}`` -> ``{"total": "..."}``)
* a 2-element list starting with "q"  -> kept as ["q", question]
* a bare string                       -> ["q", that string]
* anything else / empty / unparseable -> ["q", fallback question]
"""

from __future__ import annotations

import json
from typing import Any, Union

PromptSchema = Union[dict[str, str], list[str]]

DEFAULT_FALLBACK_QUESTION = "Extract key facts for class {class_name}."


def _fallback(class_name: str) -> list[str]:
    return ["q", DEFAULT_FALLBACK_QUESTION.format(class_name=class_name)]


def normalize_prompt_schema(raw: Any, class_name: str) -> PromptSchema:
    """Canonicalize a stored prompt schema. Accepts JSON text or decoded
    Python values; always returns a usable schema (never raises)."""
    value = raw
    if isinstance(value, str):
        try:
            value = json.loads(value)
        except (ValueError, TypeError):
            stripped = raw.strip()
            return ["q", stripped] if stripped else _fallback(class_name)

    if isinstance(value, dict):
        # unwrap {class: {field: question}} one level
        if (
            len(value) == 1
            and isinstance(next(iter(value.values())), dict)
        ):
            inner = next(iter(value.values()))
            if inner and all(isinstance(v, str) for v in inner.values()):
                return {str(k): str(v) for k, v in inner.items()}
        flat = {
            str(k): v for k, v in value.items() if isinstance(v, str) and v.strip()
        }
        if flat:
            return flat
        return _fallback(class_name)

    if isinstance(value, list):
        if len(value) == 2 and value[0] == "q" and isinstance(value[1], str):
            return ["q", value[1]]
        strs = [v for v in value if isinstance(v, str) and v.strip()]
        if strs:
            # a list of bare questions -> single freeform question
            return ["q", "; ".join(strs)]
        return _fallback(class_name)

    return _fallback(class_name)


def prompt_fields(schema: PromptSchema) -> list[str]:
    """Field names an extraction with this schema will produce.  Freeform
    ["q", ...] schemas produce a single ``answer`` field."""
    if isinstance(schema, dict):
        return sorted(schema.keys())
    return ["answer"]
