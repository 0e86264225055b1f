"""JSONL document source (S1 family, third format after Parquet+CSV).

Web corpora ship line-JSON gzipped (one .jsonl.gz per crawl shard).
Ray's `read_json` already handles this natively per file: its default
file_extensions include "jsonl.gz" and the datasource auto-detects the
gzip codec from each path (pa.Codec.detect), so plain and gzipped
shards — even mixed in one list, e.g. a directory mid-recompression —
stream-decompress inside the read tasks with the per-file task layout
unchanged. This wrapper exists to pin that contract with a test and
give the engine a single documented entry point.
"""

from __future__ import annotations

import ray.data


def read_docs_jsonl(path: str | list[str]) -> ray.data.Dataset:
    """ray.data.read_json; .gz shards decompress per file, mixing OK."""
    return ray.data.read_json(path)
