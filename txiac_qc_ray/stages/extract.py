"""Frozen, deterministic HTML -> text extraction.

The byte-identical-per-url invariant (BASELINE.json `input_hint`) demands a
fully deterministic pure-Python extractor with no library drift: regexes
only, version-pinned by this file. Do NOT "improve" the extraction without
regenerating golden fixtures.

Pipeline position: first `map_batches` stage after the read. It drops the
wide `html: binary` column immediately after extraction (SURVEY.md §4:
wide-record pressure — the html payload should never travel further down
the pipeline or through any shuffle).
"""

from __future__ import annotations

import re

import pyarrow as pa

# one combined boilerplate pattern (script/style/nav/footer) — a single
# sub() pass instead of four; backreference keeps open/close tags paired
_BOILERPLATE = re.compile(r"(?is)<(script|style|nav|footer)\b.*?</\1>")
_PARA = re.compile(r"(?is)<p\b[^>]*>(.*?)</p>")

# Inverse of sources/pages.py:_escape — order matters (&amp; last).
_UNESCAPES = (
    ("&#x27;", "'"),
    ("&quot;", '"'),
    ("&gt;", ">"),
    ("&lt;", "<"),
    ("&amp;", "&"),
)


def extract_text(html: bytes | str | None) -> str | None:
    """Extract body text from one HTML document (deterministic, pure)."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    html = _BOILERPLATE.sub("", html)
    paras = _PARA.findall(html)
    out = "\n\n".join(paras)
    if "&" in out:  # every entity contains '&'; skip 5 passes otherwise
        for ent, ch in _UNESCAPES:
            out = out.replace(ent, ch)
    return out


def extract_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage: html:binary -> text:string; drops `html`.

    Keeps any pre-existing `text` column under `text_ground_truth` only if
    requested upstream; the pipeline's canonical text column after this
    stage is the extracted one.
    """
    html_col = batch.column("html").to_pylist()
    texts = [extract_text(h) for h in html_col]
    batch = batch.drop_columns(["html"])
    if "text" in batch.column_names:
        batch = batch.drop_columns(["text"])
    return batch.append_column("text", pa.array(texts, type=pa.string()))
