"""Job entrypoint — what `ray job submit -- python -m txiac_qc_ray ...`
runs on a cluster (north_rule launch path). Owns its Ray session (guarded
init; the library itself never calls ray.init).

    python -m txiac_qc_ray run --input DIR --output DIR \
        [--files-per-partition K] [--calibrate] [--num-cpus N]

Resumable by default: rerunning with the same --output skips partitions
whose lineage records exist (state/lineage.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="txiac_qc_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run", help="run the QC pipeline over a pages parquet dir")
    runp.add_argument("--input", required=True, help="dir of pages parquet shards")
    runp.add_argument("--output", required=True, help="output dir (partitioned, resumable)")
    runp.add_argument("--files-per-partition", type=int, default=8)
    runp.add_argument("--batch-size", type=int, default=4096)
    runp.add_argument("--calibrate", action="store_true",
                      help="two-pass: recompute percentile/tukey rule thresholds "
                           "from this corpus before flagging (Home.py:337-365 E2 flow)")
    runp.add_argument("--dedup", action="store_true",
                      help="two-pass: cross-document exact dedup — pass 0 finds "
                           "pages whose extracted text loses exact dedup (min-url "
                           "copy wins), pass 1 drops them with "
                           "drop_reason=exact_duplicate via a broadcast hash set")
    runp.add_argument("--neardup", action="store_true",
                      help="two-pass: cross-document NEAR-dup dedup — pass 0 "
                           "runs MinHash-LSH + exact-Jaccard verify over the "
                           "extracted text, clusters via connected components "
                           "(min row key wins) and pass 1 drops the losers "
                           "with drop_reason=near_duplicate")
    runp.add_argument("--neardup-jaccard", type=float, default=0.8,
                      help="verified-Jaccard threshold for --neardup pairs")
    runp.add_argument("--rule-banks", default="",
                      help="comma-separated opt-in web-text rule banks "
                           "(c4,gopher,repetition,url,classifier) appended "
                           "after the default rules (pipelines/webtext.py)")
    runp.add_argument("--num-cpus", type=int, default=None,
                      help="only used when Ray is not already initialised")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .config import PipelineConfig
    from .pipelines.qc import PAGES_READ_COLUMNS, build_qc_pipeline, read_pages
    from .state.lineage import run_resumable

    cfg = PipelineConfig(batch_size=args.batch_size)
    if args.rule_banks:
        from .config import RULE_BANK_RULES

        banks = tuple(b.strip() for b in args.rule_banks.split(",") if b.strip())
        unknown = [b for b in banks if b not in RULE_BANK_RULES]
        if unknown or len(set(banks)) != len(banks):
            p.error(f"rule banks must be unique names from "
                    f"{sorted(RULE_BANK_RULES)}, got {banks}")
        cfg.rule_banks = banks
    if args.dedup:
        from .config import DEDUP_RULE
        from .pipelines.qc import exact_dup_loser_rowkeys_ds

        # pass 0: the loser row keys stream from the dedup shuffle; a
        # driver-sized set broadcasts once (fast path), a high-dup-rate
        # crawl's set stays sharded across index actors (the driver
        # never holds it — VERDICT r4 item 1). The dedup decision then
        # rides the ordinary rules stage (appended AFTER the defaults
        # so the frozen drop_reason order holds).
        losers = exact_dup_loser_rowkeys_ds(args.input, cfg).materialize()
        if losers.count() <= 4_000_000:  # ~32 MB of keys
            import numpy as np

            df = losers.to_pandas()
            keys = (np.unique(df["key"].to_numpy().astype(np.uint64))
                    if "key" in df.columns else np.zeros(0, dtype=np.uint64))
            cfg.dup_rowkeys_ref = ray.put(keys)
        else:
            from .state.dropindex import DropIndex

            idx = DropIndex(8)
            idx.add_dataset(losers, column="key")
            cfg.dup_rowkeys_ref = idx.seal()
        cfg.rules = cfg.rules + (DEDUP_RULE,)
    if args.neardup:
        from .config import NEARDUP_RULE
        from .pipelines.qc import neardup_loser_rowkeys_ds

        # pass 0 (near-dup): same broadcast-vs-sharded-index split as
        # --dedup above, over the MinHash-LSH component losers
        losers = neardup_loser_rowkeys_ds(
            args.input, cfg, args.neardup_jaccard).materialize()
        if losers.count() <= 4_000_000:
            import numpy as np

            df = losers.to_pandas()
            keys = (np.unique(df["key"].to_numpy().astype(np.int64)
                              .view(np.uint64))
                    if "key" in df.columns else np.zeros(0, dtype=np.uint64))
            cfg.neardup_rowkeys_ref = ray.put(keys)
        else:
            from .state.dropindex import DropIndex

            idx = DropIndex(8)
            idx.add_dataset(losers, column="key")
            cfg.neardup_rowkeys_ref = idx.seal()
        cfg.rules = cfg.rules + (NEARDUP_RULE,)
    if args.calibrate:
        from .pipelines.calibrate import calibrate_rules
        from .stages.extract import extract_batch
        from .stages.features import features_batch
        from .stages.perplexity import perplexity_batch

        # pass 1: stream the corpus once to calibrate data-dependent rules
        feat = (read_pages(args.input)
                .map_batches(extract_batch, batch_format="pyarrow", batch_size=cfg.batch_size)
                .map_batches(features_batch, batch_format="pyarrow", batch_size=cfg.batch_size)
                .map_batches(perplexity_batch, batch_format="pyarrow", batch_size=cfg.batch_size))
        cfg.rules = calibrate_rules(feat, cfg.rules, exact=False)  # t-digest path

    summary = run_resumable(
        args.input, args.output,
        lambda ds: build_qc_pipeline(ds, cfg),
        files_per_partition=args.files_per_partition,
        read_columns=PAGES_READ_COLUMNS,
    )
    print(json.dumps({k: summary[k] for k in
                      ("partitions", "skipped", "rows", "kept", "scrubbed")}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
