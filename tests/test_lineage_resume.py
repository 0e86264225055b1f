"""Resumable partitioned output: skip-if-done, crash recovery, idempotency
(SURVEY.md §5.5; north_rule checkpoint/lineage requirement)."""

import json
import os

import pytest

from txiac_qc_ray.config import PipelineConfig
from txiac_qc_ray.pipelines.qc import PAGES_READ_COLUMNS, build_qc_pipeline
from txiac_qc_ray.state.lineage import list_input_files, plan_partitions, run_resumable


@pytest.fixture(scope="module")
def builder():
    cfg = PipelineConfig(batch_size=256, langid_concurrency=(1, 2),
                         ppl_concurrency=(1, 2), scrub_concurrency=(1, 2))
    return lambda ds: build_qc_pipeline(ds, cfg)


def test_plan_partitions_pure():
    files = [f"f{i}" for i in range(7)]
    parts = plan_partitions(files, 3)
    assert parts == [["f0", "f1", "f2"], ["f3", "f4", "f5"], ["f6"]]


def test_run_and_resume(ray_session, pages_small_dir, tmp_path, builder):
    out = str(tmp_path / "out")
    s1 = run_resumable(pages_small_dir, out, builder, files_per_partition=2,
                       read_columns=PAGES_READ_COLUMNS)
    assert s1["partitions"] == 2 and s1["skipped"] == []
    assert s1["rows"] == 800
    assert os.path.exists(os.path.join(out, "_lineage", "00000.json"))

    # rerun: everything skipped, same totals
    s2 = run_resumable(pages_small_dir, out, builder, files_per_partition=2,
                       read_columns=PAGES_READ_COLUMNS)
    assert s2["skipped"] == [0, 1]
    assert (s2["rows"], s2["kept"], s2["scrubbed"]) == (s1["rows"], s1["kept"], s1["scrubbed"])


def test_crash_recovery_idempotent(ray_session, pages_small_dir, tmp_path, builder):
    out = str(tmp_path / "out")
    s1 = run_resumable(pages_small_dir, out, builder, files_per_partition=2,
                       read_columns=PAGES_READ_COLUMNS)
    rec_path = os.path.join(out, "_lineage", "00001.json")
    with open(rec_path) as f:
        before = json.load(f)
    # simulate a crash mid-write: lineage gone, partial garbage present
    os.remove(rec_path)
    with open(os.path.join(out, "part-00001", "junk.parquet"), "w") as f:
        f.write("garbage")
    s2 = run_resumable(pages_small_dir, out, builder, files_per_partition=2,
                       read_columns=PAGES_READ_COLUMNS)
    assert s2["skipped"] == [0]
    with open(rec_path) as f:
        after = json.load(f)
    assert after["content_hash"] == before["content_hash"]
    assert after["rows"] == before["rows"]
    assert not os.path.exists(os.path.join(out, "part-00001", "junk.parquet"))
    assert s2["kept"] == s1["kept"]


def test_lineage_counters_sum(ray_session, pages_small_dir, tmp_path, builder, golden_small):
    out = str(tmp_path / "out")
    s = run_resumable(pages_small_dir, out, builder, files_per_partition=4,
                      read_columns=PAGES_READ_COLUMNS)
    gold_kept = sum(1 for k in golden_small.column("keep").to_pylist() if k)
    assert s["kept"] == gold_kept
    rec = json.load(open(os.path.join(out, "_lineage", "00000.json")))
    assert sum(rec["rule_drop_counts"].values()) >= s["rows"] - s["kept"]


def test_list_input_files_sorted(pages_small_dir):
    files = list_input_files(pages_small_dir)
    assert files == sorted(files) and len(files) == 4


def test_run_manifest_guard(ray_session, pages_small_dir, tmp_path, builder):
    """ADVICE r1: resuming into an output dir built with a different
    partitioning plan must fail loud (stale part dirs would otherwise be
    silently excluded from the summary), and clean_mismatch=True must
    wipe and rebuild."""
    import pytest

    out = str(tmp_path / "out")
    run_resumable(pages_small_dir, out, builder, files_per_partition=1,
                  read_columns=PAGES_READ_COLUMNS)
    assert os.path.exists(os.path.join(out, "part-00003"))
    with pytest.raises(RuntimeError, match="different run plan"):
        run_resumable(pages_small_dir, out, builder, files_per_partition=2,
                      read_columns=PAGES_READ_COLUMNS)
    s = run_resumable(pages_small_dir, out, builder, files_per_partition=2,
                      read_columns=PAGES_READ_COLUMNS, clean_mismatch=True)
    assert s["partitions"] == 2 and s["skipped"] == []
    # the stale 4-partition layout is gone
    assert not os.path.exists(os.path.join(out, "part-00002"))
    # unchanged plan still resumes (all partitions skipped)
    s2 = run_resumable(pages_small_dir, out, builder, files_per_partition=2,
                       read_columns=PAGES_READ_COLUMNS)
    assert s2["skipped"] == [0, 1]


def test_corrupt_partition_fails_loud(ray_session, pages_small_dir, tmp_path, builder):
    """A corrupted written partition WITH a lineage record is trusted
    (skip-if-done contract: the record is written only after a complete
    write); but corrupting the INPUT of an unfinished partition must
    surface an exception, never silent data loss."""
    import pyarrow.parquet as pq
    import pytest as _pytest
    import shutil

    # copy inputs so we can corrupt one file
    src = tmp_path / "input"
    shutil.copytree(pages_small_dir, src)
    files = sorted(os.listdir(src))
    with open(src / files[1], "wb") as f:
        f.write(b"not a parquet file")
    out = str(tmp_path / "out")
    with _pytest.raises(Exception):
        run_resumable(str(src), out, builder, files_per_partition=1,
                      read_columns=PAGES_READ_COLUMNS)
    # partition 0 (before the corrupt file) completed; 1 has no lineage
    assert os.path.exists(os.path.join(out, "_lineage", "00000.json"))
    assert not os.path.exists(os.path.join(out, "_lineage", "00001.json"))
