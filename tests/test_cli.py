"""Job CLI: `python -m txiac_qc_ray run ...` end-to-end in a subprocess
(owns its own Ray session) + resume on second invocation."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    from txiac_qc_ray.sources.pages import generate_pages_parquet

    d = str(tmp_path_factory.mktemp("cli_corpus"))
    generate_pages_parquet(d, 3000)
    return d


def run_cli(corpus_dir, out, extra=()):
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("RAY_ADDRESS", None)  # CLI owns its session in this subprocess
    res = subprocess.run(
        [sys.executable, "-m", "txiac_qc_ray", "run", "--input", corpus_dir,
         "--output", out, "--files-per-partition", "1", "--num-cpus", "4", *extra],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=420)
    assert res.returncode == 0, res.stderr[-2000:]
    return json.loads([l for l in res.stdout.splitlines() if l.startswith("{")][-1])


def test_cli_run_and_resume(corpus_dir, tmp_path):
    out = str(tmp_path / "out")
    s1 = run_cli(corpus_dir, out)
    assert s1["rows"] == 3000 and s1["skipped"] == []
    assert s1["kept"] > 0 and s1["scrubbed"] > 0
    # output exists, partitioned, with lineage
    parts = [d for d in os.listdir(out) if d.startswith("part-")]
    assert len(parts) == s1["partitions"]
    f = next(os.path.join(out, parts[0], p) for p in os.listdir(os.path.join(out, parts[0])))
    assert "keep" in pq.ParquetFile(f).schema_arrow.names

    s2 = run_cli(corpus_dir, out)
    assert s2["skipped"] == list(range(s1["partitions"]))
    assert (s2["rows"], s2["kept"]) == (s1["rows"], s1["kept"])
