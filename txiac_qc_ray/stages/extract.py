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


def extract_texts_arrow(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized RE2 twin of `extract_text` over a whole binary column
    (VERDICT r1 item 7 — the per-row Python loop was the #2 hot-path
    cost). Byte-identical to the Python-re path, which remains the
    independent oracle implementation (oracle.py) and is pinned against
    this one by the frozen golden tests:

      - boilerplate strip: RE2 has no backreferences, so the combined
        `<(tag)...</\\1>` pattern becomes one non-backref pass per tag —
        equivalent because the generator's boilerplate blocks never nest
        across tags (golden-verified, not assumed);
      - paragraph extraction: split on `</p>`, then per piece capture
        from the first `<p...>` to the piece end (each piece holds at
        most one open tag once closers are consumed), and re-join the
        matching pieces with a vectorized list join;
      - entity unescape: plain replace_substring passes in frozen order.
    """
    import numpy as np
    import pyarrow.compute as pc

    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    is_null = np.asarray(html.is_null())
    try:
        s = pc.cast(pc.fill_null(html, b""), pa.string())  # valid-utf8 fast path
    except pa.ArrowInvalid:
        # invalid UTF-8 somewhere in the batch (ADVICE r2): degrade ONLY
        # this batch to the per-row oracle path (decode errors='replace'),
        # which keeps output identical to extract_text instead of killing
        # the whole pipeline on one malformed production page
        return pa.array([extract_text(v) for v in html.to_pylist()],
                        type=pa.string())
    # backref-free expansion of `<(tag)...</\1>`: one RE2 pass over the
    # whole column (leftmost-first across the alternation == the Python
    # combined pattern's scan order)
    s = pc.replace_substring_regex(
        s,
        pattern=(r"(?is)(?:<script\b.*?</script>|<style\b.*?</style>"
                 r"|<nav\b.*?</nav>|<footer\b.*?</footer>)"),
        replacement="")
    pieces = pc.split_pattern_regex(s, "(?i)</p>")
    pieces = pieces.combine_chunks() if isinstance(pieces, pa.ChunkedArray) else pieces
    flat = pc.list_flatten(pieces)
    row_of = np.repeat(np.arange(len(pieces), dtype=np.int64),
                       np.diff(np.asarray(pieces.offsets)))
    # match + head-strip is ~6x cheaper than a capturing extract_regex
    ok = np.asarray(pc.match_substring_regex(flat, pattern=r"(?i)<p\b[^>]*>"))
    # the tail piece after a row's final </p> is never a CLOSED paragraph
    # (python-re `.*?</p>` would not match an unclosed trailing <p>)
    po = np.asarray(pieces.offsets)
    ok[po[1:] - 1] = False
    content = pc.replace_substring_regex(
        flat, pattern=r"(?is)^.*?<p\b[^>]*>", replacement="", max_replacements=1)
    kept = content.filter(pa.array(ok))
    kept_rows = row_of[ok]
    counts = np.bincount(kept_rows, minlength=len(pieces))
    offsets = np.zeros(len(pieces) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), kept),
        "\n\n")
    for ent, ch in _UNESCAPES:
        joined = pc.replace_substring(joined, pattern=ent, replacement=ch)
    if is_null.any():
        joined = pc.if_else(pa.array(~is_null), joined, pa.scalar(None, pa.string()))
    return joined if isinstance(joined, pa.Array) else joined.combine_chunks()


def extract_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage: html:binary -> text:string; drops `html`.

    Keeps any pre-existing `text` column under `text_ground_truth` only if
    requested upstream; the pipeline's canonical text column after this
    stage is the extracted one.
    """
    texts = extract_texts_arrow(batch.column("html"))
    batch = batch.drop_columns(["html"])
    if "text" in batch.column_names:
        batch = batch.drop_columns(["text"])
    return batch.append_column("text", texts)
