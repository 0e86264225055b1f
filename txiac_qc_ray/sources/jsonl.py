"""JSONL document source (S1 family, third format after Parquet+CSV).

Web corpora ship line-JSON gzipped (one .jsonl.gz per crawl shard); a
`.gz` path streams through Arrow's gzip decompressor inside the read
tasks — no driver-side decompression, and the per-file task layout is
unchanged, so a sharded directory of .jsonl.gz files parallelizes
exactly like plain JSONL.
"""

from __future__ import annotations

import ray.data


def read_docs_jsonl(path: str | list[str]) -> ray.data.Dataset:
    """ray.data.read_json with transparent gzip for .gz paths."""
    paths = [path] if isinstance(path, str) else list(path)
    kw = {}
    if all(p.endswith(".gz") for p in paths):
        kw["arrow_open_stream_args"] = {"compression": "gzip"}
    elif any(p.endswith(".gz") for p in paths):
        raise ValueError("mixing .gz and plain JSONL in one read is not "
                         "supported — pass them as two reads and union")
    return ray.data.read_json(paths, **kw)
