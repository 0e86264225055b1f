"""Resumable partitioned output with per-partition lineage records.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics ... any partition can resume idempotently."

Layout (SURVEY.md §4):

    out_dir/
      part-00000/ *.parquet      one directory per input partition
      part-00001/ ...
      _lineage/00000.json        written ATOMICALLY after the partition's
                                 data is fully on disk (tmp + rename)
      _lineage/00001.json ...

A partition = a fixed slice of the sorted input-file list (so the mapping
is a pure function of the input listing, never of scheduling). On rerun,
partitions whose lineage record exists are skipped; a partition killed
mid-write left no lineage record and its directory is overwritten —
idempotent by construction.

Each lineage record carries the partition's input files, row counts,
per-rule drop counters and a content hash of (url, keep) — the "metrics"
half of the rule. The reference analog of skip-if-done is its
`@st.cache_data` memoization (Home.py:92,109,143,161,187), which this
replaces with an explicit, durable, per-partition checkpoint.

Each partition is itself a streaming Ray Data pipeline (read -> stages ->
write); at 100 TB a partition is O(100 GB) of input files, so the object
store only ever holds a partition's working set, and a cluster-wide
failure loses at most the unfinished partitions.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.urls import fnv1a64


def list_input_files(input_dir: str) -> list[str]:
    return sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if f.endswith(".parquet")
    )


def plan_partitions(files: list[str], files_per_partition: int) -> list[list[str]]:
    return [files[i : i + files_per_partition] for i in range(0, len(files), files_per_partition)]


def _partition_metrics(batch: pa.Table) -> pa.Table:
    """Tiny per-batch metrics partial: rows, kept, scrubbed, url^keep hash."""
    keep_col = batch.column("keep")
    if isinstance(keep_col, pa.ChunkedArray):
        keep_col = keep_col.combine_chunks()
    keep = np.asarray(pc.fill_null(keep_col, False))
    h = fnv1a64(batch.column("url"))
    mix = h ^ np.where(keep, np.uint64(0x9E3779B97F4A7C15), np.uint64(0))
    # XOR-fold: order-independent content hash over (url, keep)
    content = np.bitwise_xor.reduce(mix) if len(mix) else np.uint64(0)
    rule_cols = [c for c in batch.column_names
                 if c.startswith("rule_") and c != "rule_flags"]
    row = {
        "rows": [batch.num_rows],
        "kept": [int(keep.sum())],
        "scrubbed": [int(np.asarray(pc.fill_null(batch.column("scrubbed").combine_chunks()
                     if isinstance(batch.column("scrubbed"), pa.ChunkedArray)
                     else batch.column("scrubbed"), False)).sum())],
        "content_hash": [f"{int(content):016x}"],
    }
    for c in rule_cols:
        col = batch.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        row[c] = [int(np.asarray(pc.fill_null(col, False)).sum())]
    return pa.table(row)


def run_partition(
    pid: int,
    files: list[str],
    out_dir: str,
    pipeline_builder: Callable[[ray.data.Dataset], ray.data.Dataset],
    read_columns: list[str] | None = None,
) -> dict:
    """Run one partition end-to-end (streaming) and write data + lineage."""
    part_dir = os.path.join(out_dir, f"part-{pid:05d}")
    if os.path.exists(part_dir):
        shutil.rmtree(part_dir)  # a crashed attempt left data but no lineage
    ds = ray.data.read_parquet(files, columns=read_columns)
    labeled = pipeline_builder(ds)
    labeled.write_parquet(part_dir)

    # second streaming pass over the written partition for metrics (cheap:
    # reads back only the narrow label columns, not text)
    cols = ["url", "keep", "scrubbed"]
    written = ray.data.read_parquet(part_dir)
    rule_cols = [c for c in written.schema().names
                 if c.startswith("rule_") and c != "rule_flags"]
    metrics_ds = ray.data.read_parquet(part_dir, columns=cols + rule_cols)
    partials = metrics_ds.map_batches(_partition_metrics, batch_format="pyarrow").to_pandas()
    record = {
        "partition": pid,
        "input_files": files,
        "rows": int(partials["rows"].sum()),
        "kept": int(partials["kept"].sum()),
        "scrubbed": int(partials["scrubbed"].sum()),
        "content_hash": (
            f"{int(np.bitwise_xor.reduce(np.array([int(h, 16) for h in partials['content_hash']], dtype=np.uint64))):016x}"
            if len(partials) else "0" * 16
        ),
        "rule_drop_counts": {c: int(partials[c].sum()) for c in partials.columns if c.startswith("rule_")},
    }
    lineage_dir = os.path.join(out_dir, "_lineage")
    os.makedirs(lineage_dir, exist_ok=True)
    tmp = os.path.join(lineage_dir, f"{pid:05d}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(record, f, indent=1)
    os.replace(tmp, os.path.join(lineage_dir, f"{pid:05d}.json"))
    return record


def _check_run_manifest(out_dir: str, files: list[str],
                        files_per_partition: int, clean_mismatch: bool) -> None:
    """Run-level manifest guard (ADVICE r1): a rerun against an output
    directory produced from a DIFFERENT input listing or partitioning
    would leave stale part-NNNNN/ dirs on disk, silently excluded from
    the summary but visible to consumers globbing part-*/*.parquet.
    The manifest records the full plan; a mismatch fails loud (or wipes
    the output dir when clean_mismatch=True)."""
    manifest = {"input_files": files, "files_per_partition": files_per_partition}
    lineage_dir = os.path.join(out_dir, "_lineage")
    path = os.path.join(lineage_dir, "_manifest.json")
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        if prev != manifest:
            if not clean_mismatch:
                raise RuntimeError(
                    f"{out_dir} was produced from a different run plan "
                    f"({len(prev.get('input_files', []))} files / "
                    f"{prev.get('files_per_partition')} per partition vs "
                    f"{len(files)} / {files_per_partition}); pass "
                    "clean_mismatch=True to wipe and rebuild, or use a "
                    "fresh output directory")
            shutil.rmtree(out_dir)
    os.makedirs(lineage_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, path)


def run_resumable(
    input_dir: str,
    out_dir: str,
    pipeline_builder: Callable[[ray.data.Dataset], ray.data.Dataset],
    files_per_partition: int = 4,
    read_columns: list[str] | None = None,
    clean_mismatch: bool = False,
) -> dict:
    """Run all partitions, skipping any with an existing lineage record.

    Returns a summary: per-partition records plus which were skipped.
    Refuses to resume into an output dir built from a different input
    listing / partitioning (see _check_run_manifest).
    """
    files = list_input_files(input_dir)
    parts = plan_partitions(files, files_per_partition)
    _check_run_manifest(out_dir, files, files_per_partition, clean_mismatch)
    lineage_dir = os.path.join(out_dir, "_lineage")
    done: dict[int, dict] = {}
    skipped: list[int] = []
    for pid, part_files in enumerate(parts):
        rec_path = os.path.join(lineage_dir, f"{pid:05d}.json")
        if os.path.exists(rec_path):
            with open(rec_path) as f:
                rec = json.load(f)
            if rec.get("input_files") == part_files:
                done[pid] = rec
                skipped.append(pid)
                continue
        done[pid] = run_partition(pid, part_files, out_dir, pipeline_builder, read_columns)
    return {
        "partitions": len(parts),
        "skipped": skipped,
        "rows": sum(r["rows"] for r in done.values()),
        "kept": sum(r["kept"] for r in done.values()),
        "scrubbed": sum(r["scrubbed"] for r in done.values()),
        "records": [done[p] for p in sorted(done)],
    }
