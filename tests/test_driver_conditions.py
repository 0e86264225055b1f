"""Worker-side import contract under DRIVER conditions.

The driver initialises Ray itself, chdirs wherever it likes, and loads
`__ray_entry__.py` via a sys.path hack — so Ray WORKERS cannot `import
txiac_qc_ray` at task runtime. `_register_by_value` ships the package's
function objects by value, which covers every module-level binding a
closure references — but NOT an `import` statement executed inside a
worker-side function: that hits the real import system on the worker
and raises ModuleNotFoundError. Found live on the last session's new op
(state/dropindex._mix64 lazily imported pipelines.docs inside an actor
call); three more latent sites were fixed in the same sweep (the
rule-banks branch of scoring.qc_batch, qc.pages_as_docs.adapt,
webtext._lines_hashed).

This test reproduces the driver's exact conditions in a SUBPROCESS —
foreign cwd, spec-based import, its own Ray session — and runs the ops
that route through the previously-broken paths. The local sweep can
never catch this class: its cwd is the repo, so workers can import the
package there.
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent("""
    import ray, sys
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, {repo!r})
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", {entry!r})
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    q = m.queries()
    sf = "/root/testdata/sf0.001"
    # DropIndex-routed ops (the actor path that broke), the boilerplate
    # op whose batch fn lazily imported the mixer, and the BPE ops whose
    # worker-side tokenizer lazily imported the frozen merge table
    for name in ("top_dup_windows", "dup_window_fraction",
                 "remove_boilerplate_lines", "prep_corpus",
                 "token_counts_bpe", "chunk_for_training_bpe"):
        res = q[name](sf)
        n = res.count() if hasattr(res, "count") and hasattr(
            res, "iter_batches") else len(res)
        print(name, "rows", n, flush=True)
    # flagship with a rule bank enabled (the scoring.qc_batch branch)
    from txiac_qc_ray.config import PipelineConfig
    from txiac_qc_ray.pipelines.qc import build_qc_pipeline, read_pages
    from txiac_qc_ray.sources.pages import default_pages_dir
    cfg = PipelineConfig(stage_mode="tasks", rule_banks=("c4",))
    n = build_qc_pipeline(read_pages(default_pages_dir(500)), cfg).count()
    print("flagship+banks rows", n, flush=True)
    # the --dedup launch flow (worker-side page_row_keys) + the
    # resumable sink's lineage metrics pass (worker-side fnv1a64)
    from txiac_qc_ray.pipelines.qc import (PAGES_READ_COLUMNS,
                                           exact_dup_loser_rowkeys)
    from txiac_qc_ray.state.lineage import run_resumable
    corpus = default_pages_dir(500)
    keys_ref = ray.put(exact_dup_loser_rowkeys(corpus))
    cfg2 = PipelineConfig(stage_mode="tasks", dup_rowkeys_ref=keys_ref)
    import shutil
    out = "/tmp/driver_cond_out"; shutil.rmtree(out, ignore_errors=True)
    s = run_resumable(corpus, out,
                      lambda ds: build_qc_pipeline(ds, cfg2),
                      files_per_partition=1,
                      read_columns=PAGES_READ_COLUMNS)
    print("dedup+resumable rows", s["rows"], flush=True)
    # DropIndex mixer identity: the inlined copy == pipelines.docs._mix64
    import numpy as np
    from txiac_qc_ray.pipelines.docs import _mix64 as mix_docs
    from txiac_qc_ray.state.dropindex import _mix64 as mix_idx
    probe = np.arange(1000, dtype=np.uint64) * np.uint64(2654435761)
    assert (mix_docs(probe.copy()) == mix_idx(probe.copy())).all()
    ray.shutdown()
    print("DRIVER-CONDITIONS-OK", flush=True)
""")


def test_queries_survive_foreign_cwd_driver_import(tmp_path):
    script = _SCRIPT.format(repo=REPO,
                            entry=os.path.join(REPO, "__ray_entry__.py"))
    out = subprocess.run([sys.executable, "-c", script], cwd=str(tmp_path),
                         env={**os.environ, "PYTHONPATH": ""},
                         capture_output=True, text=True, timeout=540)
    assert "DRIVER-CONDITIONS-OK" in out.stdout, (
        f"stdout:\n{out.stdout[-2000:]}\nstderr:\n{out.stderr[-3000:]}")
