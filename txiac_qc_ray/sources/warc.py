"""WARC source (S1 family, fourth format after Parquet+CSV+JSONL).

Common Crawl ships its corpus as WARC ("Web ARChive", ISO 28500)
shards — the canonical container for the (url, warc_ts, html) page rows
this engine's flagship consumes (BASELINE.json `input_hint`). This
module implements both directions from the PUBLIC spec, no libraries:

* :class:`WarcDatasource` — a from-scratch **streaming** Ray
  ``FileBasedDatasource``: one read task per shard (the Common Crawl
  layout — ~1 GiB shards — maps 1:1 onto Ray's file-parallel reads),
  each task scanning its shard incrementally (bounded buffer, never
  ``readall``) and yielding Arrow blocks of parsed ``response``
  records every ``rows_per_block`` rows, so a shard larger than worker
  heap still streams. ``.gz`` shards are transparently decompressed by
  Ray's ``_open_input_source`` (codec detected from the path) before
  ``_read_stream`` sees the bytes.
* :func:`write_pages_warc` — the deterministic fixture serializer
  (used by tests/bench only): renders a pages parquet directory as
  spec-conformant WARC/1.0 shards (``warcinfo`` head record + one
  ``response`` record per page wrapping an HTTP/1.1 envelope). Common
  Crawl gzips each record as its own gzip member to allow offset-based
  random access; the shards here are one gzip stream per file — the
  sequential parser is agnostic (it sees the same decompressed bytes
  either way), and a multi-member stream decodes identically through
  the same codec path.

Record grammar implemented (WARC 1.0, ISO 28500 §4): a record is a
version line ``WARC/1.0\\r\\n``, named-field header lines, a blank
line, then exactly ``Content-Length`` octets of content block, then
two CRLFs. ``response`` records carry ``application/http;
msgtype=response`` content — the page payload starts after the HTTP
header terminator (first ``\\r\\n\\r\\n`` inside the content block).

Rows with NULL html are not representable in WARC (a crawler never
emits a response record without a payload) and are skipped by the
serializer; readers of the parquet twin must filter ``html IS NOT
NULL`` to compare.

Reference parity: the reference app has no binary-container sources at
all (Home.py:98-106 reads CSVs with pandas); this closes the gap to
the Common-Crawl-style ingestion the north star demands.
"""

from __future__ import annotations

import datetime
import glob
import gzip
import json
import os
from typing import TYPE_CHECKING, Iterator, List, Union

import pyarrow as pa

from ray.data.datasource.file_based_datasource import FileBasedDatasource

if TYPE_CHECKING:
    import ray.data

WARC_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
    ]
)

_CRLF2 = b"\r\n\r\n"
_READ_CHUNK = 1 << 20  # 1 MiB buffered reads: bounded memory per task


def _parse_warc_date(s: str) -> datetime.datetime:
    """WARC-Date is W3C ISO-8601 UTC ('2024-01-01T00:00:14Z'); WARC 1.1
    allows fractional seconds — accept both, return a naive UTC stamp
    (matching the parquet `timestamp[us]` column)."""
    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1]
    fmt = "%Y-%m-%dT%H:%M:%S.%f" if "." in s else "%Y-%m-%dT%H:%M:%S"
    return datetime.datetime.strptime(s, fmt)


class WarcDatasource(FileBasedDatasource):
    """Streaming WARC reader: yields (url, warc_ts, html) per
    ``response`` record; every other record type (warcinfo, request,
    metadata, ...) is skipped. One Ray read task per shard."""

    _FILE_EXTENSIONS = ["warc", "warc.gz"]

    def __init__(self, paths: Union[str, List[str]], *,
                 rows_per_block: int = 512, **kwargs):
        super().__init__(paths, file_extensions=self._FILE_EXTENSIONS,
                         **kwargs)
        self._rows_per_block = rows_per_block

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator[pa.Table]:
        buf = bytearray()
        eof = False
        urls: list[str] = []
        stamps: list[datetime.datetime] = []
        payloads: list[bytes] = []

        def _fill(need: int) -> bool:
            """Grow buf to >= need bytes; False once the stream is dry."""
            nonlocal eof
            while len(buf) < need and not eof:
                chunk = f.read(_READ_CHUNK)
                if not chunk:
                    eof = True
                    break
                buf.extend(chunk)
            return len(buf) >= need

        def _flush() -> pa.Table:
            t = pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "warc_ts": pa.array(stamps, pa.timestamp("us")),
                    "html": pa.array(payloads, pa.binary()),
                },
                schema=WARC_SCHEMA,
            )
            urls.clear(); stamps.clear(); payloads.clear()
            return t

        while True:
            # --- header block: up to the first blank line ---
            hdr_end = buf.find(_CRLF2)
            while hdr_end < 0 and not eof:
                _fill(len(buf) + _READ_CHUNK)  # grows buf even at EOF
                hdr_end = buf.find(_CRLF2)
            if hdr_end < 0:
                if bytes(buf).strip():
                    raise ValueError(f"truncated WARC header in {path}")
                break
            header = bytes(buf[:hdr_end]).decode("utf-8", errors="replace")
            lines = header.split("\r\n")
            if not lines[0].startswith("WARC/"):
                raise ValueError(
                    f"bad WARC version line {lines[0]!r} in {path}")
            fields: dict[str, str] = {}
            for ln in lines[1:]:
                k, _, v = ln.partition(":")
                fields[k.strip().lower()] = v.strip()
            clen = int(fields["content-length"])

            # --- content block: exactly clen octets + CRLF CRLF ---
            start = hdr_end + len(_CRLF2)
            if not _fill(start + clen + len(_CRLF2)):
                raise ValueError(f"truncated WARC content block in {path}")
            content = bytes(buf[start:start + clen])
            del buf[:start + clen + len(_CRLF2)]

            if fields.get("warc-type") == "response":
                http_end = content.find(_CRLF2)
                if http_end < 0:
                    raise ValueError(
                        f"response record without HTTP envelope in {path}")
                urls.append(fields["warc-target-uri"])
                stamps.append(_parse_warc_date(fields["warc-date"]))
                payloads.append(content[http_end + len(_CRLF2):])
                if len(urls) >= self._rows_per_block:
                    yield _flush()

        if urls:
            yield _flush()


def read_pages_warc(paths: Union[str, List[str]],
                    **kwargs) -> "ray.data.Dataset":
    """Read WARC shard(s) into a Dataset(url, warc_ts, html) — one read
    task per shard, records streamed in bounded blocks."""
    import ray.data

    return ray.data.read_datasource(WarcDatasource(paths, **kwargs))


# --------------------------------------------------------------------------
# fixture serializer (tests/bench only — deterministic, cached)

def _render_record(url: str, ts: datetime.datetime, html: bytes,
                   rec_index: int) -> bytes:
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n"
            + html)
    # record id must be deterministic (no uuid4): derived from the index
    rid = f"<urn:uuid:00000000-0000-4000-8000-{rec_index:012d}>"
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: response\r\n"
           f"WARC-Record-ID: {rid}\r\n"
           f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%S')}Z\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"Content-Type: application/http; msgtype=response\r\n"
           f"Content-Length: {len(http)}\r\n\r\n").encode()
    return hdr + http + _CRLF2


def _warcinfo_record(shard: int) -> bytes:
    body = (b"software: txiac_qc_ray fixture serializer\r\n"
            b"format: WARC File Format 1.0\r\n")
    rid = f"<urn:uuid:00000000-0000-4000-8000-ffff{shard:08d}>"
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: warcinfo\r\n"
           f"WARC-Record-ID: {rid}\r\n"
           f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           f"Content-Type: application/warc-fields\r\n"
           f"Content-Length: {len(body)}\r\n\r\n").encode()
    return hdr + body + _CRLF2


def write_pages_warc(pages_dir: str, out_dir: str,
                     rows_per_shard: int = 500, compress: bool = True) -> str:
    """Render a pages parquet dir as WARC shards (cached, resumable —
    same meta-guard + per-shard tmp/replace layout as the pages
    generator). NULL-html rows are skipped (not representable)."""
    import pyarrow.parquet as pq

    meta_path = os.path.join(out_dir, "_meta.json")
    meta = {"pages_dir": pages_dir, "rows_per_shard": rows_per_shard,
            "compress": compress, "v": 1}
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            if json.load(fh) == meta:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    parts = sorted(glob.glob(os.path.join(pages_dir, "part-*.parquet")))
    tbl = pq.read_table(parts, columns=["url", "warc_ts", "html"])
    urls = tbl["url"].to_pylist()
    stamps = tbl["warc_ts"].to_pylist()
    htmls = tbl["html"].to_pylist()
    rows = [(u, t, h) for u, t, h in zip(urls, stamps, htmls)
            if h is not None]
    ext = "warc.gz" if compress else "warc"
    for k, start in enumerate(range(0, len(rows), rows_per_shard)):
        path = os.path.join(out_dir, f"crawl-{k:05d}.{ext}")
        blob = bytearray(_warcinfo_record(k))
        for j, (u, t, h) in enumerate(rows[start:start + rows_per_shard]):
            blob.extend(_render_record(u, t, h, start + j))
        tmp = path + ".tmp"
        if compress:
            # fixed mtime so shard bytes are a pure function of content
            with open(tmp, "wb") as raw, \
                    gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as gz:
                gz.write(bytes(blob))
        else:
            with open(tmp, "wb") as raw:
                raw.write(bytes(blob))
        os.replace(tmp, path)
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    return out_dir


def default_warc_dir(n_docs: int, seed: int = 42,
                     root: str = "/tmp/txiac_warc") -> str:
    """WARC twin of sources.pages.default_pages_dir — renders (and
    caches) the deterministic pages corpus as WARC shards."""
    from .pages import default_pages_dir

    pages = default_pages_dir(n_docs, seed)
    out = os.path.join(root, f"seed{seed}_n{n_docs}")
    return write_pages_warc(pages, out)
