"""Pluggable document-AI backends (SURVEY.md section 2.9, AI1-AI5).

The reference delegates five operations to Snowflake Cortex:

  AI1 classify    AI_EXTRACT(file, {'document_class': ...})   `app.py:457-462`
  AI2 extract     AI_EXTRACT(file, responseFormat=prompts)    `app.py:202-210`
  AI3 ocr         SNOWFLAKE.CORTEX.PARSE_DOCUMENT 'layout'    `app.py:212-215`
  AI4 summarize   AI_COMPLETE('mistral-7b', ...) 6000-char cap `app.py:217-220`
  AI5 gen_prompts AI_COMPLETE -> flat {field: question} JSON  `app.py:481-489`

Here they are a Protocol so the engine can swap a real LLM endpoint in
production while tests use :class:`DeterministicStubBackend` — pure functions
of the input, seeded by content, so the whole pipeline is reproducible and
oracle-checkable (the stub logic is deliberately simple enough to mirror in
ANSI SQL).

Error contract (AI7): backends never raise out of the pipeline; failures are
encoded as ``{"error": ...}`` envelopes and persisted (`app.py:506-510`).
"""

from __future__ import annotations

import json
from typing import Protocol

from unstructured_data_pipeline_spark.functions.variant import canonical_json

# the reference truncates summarization input to 6000 chars (`app.py:218`)
SUMMARY_INPUT_CAP = 6000
SUMMARY_WORDS = 12


class DocumentAIBackend(Protocol):
    def classify(self, text: str) -> str: ...
    def extract(self, text: str, prompts_json: str) -> dict[str, str]: ...
    def ocr(self, content: bytes) -> str: ...
    def summarize(self, text: str) -> str: ...
    def generate_prompts(self, class_name: str) -> dict[str, str]: ...


class DeterministicStubBackend:
    """Seeded, pure-function stand-ins for the five Cortex calls.

    Every rule here has an exact ANSI-SQL mirror (used by the DuckDB
    oracles), which is what makes the end-to-end pipeline part of the
    hash-checked correctness gate rather than a trust-me component.
    """

    # -- AI1 ----------------------------------------------------------------
    def classify(self, text: str) -> str:
        """Keyword classifier: deterministic in content."""
        t = text or ""
        if "customer" in t:
            return "invoice"
        if "stream" in t:
            return "receipt"
        return "contract"

    # -- AI2 ----------------------------------------------------------------
    def extract(self, text: str, prompts_json: str) -> dict[str, str]:
        """Answer each prompt field with a deterministic text statistic.

        Any field name is answered (the stub ignores the question wording and
        keys off the field name); unknown fields get the first token — so
        LLM-generated schemas still extract reproducibly.
        """
        import hashlib

        t = text or ""
        words = t.split(" ") if t else []
        try:
            prompts = json.loads(prompts_json) if prompts_json else {}
        except (ValueError, TypeError):
            prompts = {}
        if isinstance(prompts, list):  # freeform ["q", question]
            prompts = {"answer": prompts[1] if len(prompts) > 1 else ""}

        out: dict[str, str] = {}
        for field in prompts:
            if field == "n_words":
                out[field] = str(len(words))
            elif field == "first_word":
                out[field] = words[0] if words else ""
            elif field == "fingerprint":
                out[field] = hashlib.md5(t.encode("utf-8")).hexdigest()
            else:
                out[field] = words[0] if words else ""
        return out

    # -- AI3 ----------------------------------------------------------------
    def ocr(self, content: bytes) -> str:
        """Layout-aware parse with content sniffing (PARSE_DOCUMENT
        counterpart, `app.py:212-215`):

        - ``%PDF`` magic -> real PDF text extraction (pypdfium2 when
          installed, a pure-Python uncompressed-stream parser otherwise —
          see :mod:`..ai.pdf`);
        - image magic (png/jpeg/gif/bmp) -> text via the optional
          Pillow+pytesseract tier (:mod:`..ai.image_ocr`; reference accepts
          jpg/png at `app.py:365`), falling back to a deterministic
          ``<image:fmt:hex>`` marker when the OCR libs are absent or fail;
        - utf-8 text blobs -> decoded as-is;
        - anything else (audio — decoders not in this container) ->
          a deterministic hex-prefix marker.

        Always a pure function of the bytes (given a fixed library tier),
        so the OCR path stays replayable and oracle-friendly."""
        from unstructured_data_pipeline_spark.ai import image_ocr as _img
        from unstructured_data_pipeline_spark.ai import pdf as _pdf

        if _pdf.is_pdf(content):
            text = _pdf.extract_pdf_text(content)
            if text is None:
                text = f"<pdf:{content[:8].hex()}>"
            return canonical_json({"content": text, "mode": "layout", "source": "pdf"})
        fmt = _img.sniff_image_format(content)
        if fmt is not None:
            text = _img.extract_image_text(content)
            if text is None:
                text = f"<image:{fmt}:{content[:8].hex()}>"
            return canonical_json(
                {"content": text, "mode": "layout", "source": "image"}
            )
        try:
            text = content.decode("utf-8")
        except (UnicodeDecodeError, AttributeError):
            text = f"<binary:{content[:8].hex() if content else ''}>"
        return canonical_json({"content": text, "mode": "layout"})

    # -- AI4 ----------------------------------------------------------------
    def summarize(self, text: str) -> str:
        """First SUMMARY_WORDS tokens of the (capped) text — applied after
        the reference's 6000-char truncation contract."""
        t = (text or "")[:SUMMARY_INPUT_CAP]
        words = t.split(" ")
        head = " ".join(words[:SUMMARY_WORDS])
        return head + (" ..." if len(words) > SUMMARY_WORDS else "")

    # -- AI5 ----------------------------------------------------------------
    def generate_prompts(self, class_name: str) -> dict[str, str]:
        """Deterministic flat {field: question} schema per class."""
        return {
            "first_word": f"What is the first word of this {class_name}?",
            "n_words": f"How many words does this {class_name} contain?",
            "fingerprint": f"Provide a content fingerprint for this {class_name}.",
        }
