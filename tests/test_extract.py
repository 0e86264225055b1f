"""Byte-identical HTML->text extraction (BASELINE.json input_hint invariant)."""

from txiac_qc_ray.sources.pages import pages_batch, _render_html
from txiac_qc_ray.stages.extract import extract_text, extract_batch


def test_extract_byte_identical(pages_small):
    texts = pages_small.column("text").to_pylist()
    htmls = pages_small.column("html").to_pylist()
    for h, t in zip(htmls, texts):
        assert extract_text(h) == t


def test_extract_null_html():
    assert extract_text(None) is None


def test_extract_entities_roundtrip():
    text = "Tom & Jerry's <show> say \"hi\" > bye"
    html = _render_html(text, 0)
    assert extract_text(html.encode()) == text


def test_extract_strips_boilerplate():
    html = _render_html("Body para.", 7)
    out = extract_text(html.encode())
    assert out == "Body para."
    assert "Home" not in out and "boilerplate" not in out and "font-family" not in out


def test_extract_batch_drops_html(pages_small):
    out = extract_batch(pages_small.slice(0, 50))
    assert "html" not in out.column_names
    assert out.column("text").to_pylist() == pages_small.slice(0, 50).column("text").to_pylist()


def test_multiline_paragraphs():
    text = "Para one. More.\n\nPara two."
    html = _render_html(text, 1)
    assert extract_text(html.encode()) == text


def test_arrow_extract_matches_python_re(pages_small):
    """The vectorized RE2 extractor must be byte-identical to the frozen
    Python-re reference on the fixture corpus AND on adversarial edges
    (null, empty, unclosed <p>, boilerplate interleaving, entities)."""
    import pyarrow as pa

    from txiac_qc_ray.stages.extract import extract_text, extract_texts_arrow

    adversarial = [
        None,
        b"",
        b"<p>plain</p>",
        b"<p>unclosed tail",
        b"<p>a</p>junk<p>unclosed",
        b"<P CLASS='x'>case</P>",
        b"<script>var a;</script><p>kept</p><style>.x{}</style>",
        b"<p>&lt;tag&gt; &amp;amp; &quot;q&quot; &#x27;s&#x27;</p>",
        b"<p>first</p>\n<p>second</p>",
        b"<nav><a>x</a></nav><footer>f</footer>",
        b"no paragraphs at all",
        b"<p></p>",
        "<p>unicode é中文</p>".encode(),
    ]
    arr = pa.array(list(pages_small.column("html").to_pylist()) + adversarial,
                   type=pa.binary())
    got = extract_texts_arrow(arr).to_pylist()
    exp = [extract_text(h) for h in arr.to_pylist()]
    assert got == exp


def test_arrow_extract_invalid_utf8_fallback():
    """A batch containing invalid UTF-8 must not abort (ADVICE r2): the
    vectorized path degrades to the per-row errors='replace' oracle path
    for that batch and stays byte-identical to extract_text."""
    import pyarrow as pa

    from txiac_qc_ray.stages.extract import extract_text, extract_texts_arrow

    bad = [
        b"<p>caf\xe9 latin-1 byte</p>",          # lone continuation-less byte
        b"<p>ok</p>",                             # valid row in same batch
        b"\xff\xfe<p>bom-ish garbage</p>",
        None,
        b"<p>truncated \xe2\x82</p>",             # cut multi-byte sequence
    ]
    arr = pa.array(bad, type=pa.binary())
    got = extract_texts_arrow(arr).to_pylist()
    exp = [extract_text(h) for h in bad]
    assert got == exp
    assert "caf� latin-1 byte" in got[0]
