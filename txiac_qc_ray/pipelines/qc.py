"""The flagship QC pipeline: pages -> labeled/scrubbed docs + counters.

Idiomatic Ray Data composition (SURVEY.md §3 E1-E3 re-expressed):

    read_parquet(pages)                     # column-pruned at the read
      -> map_batches(extract)               # stateless; drops html ASAP
      -> map_batches(features)              # stateless vectorized heuristics
      -> map_batches(LangIdStage,  conc=N)  # actor pool, frozen model
      -> map_batches(PerplexityStage, conc=N)
      -> map_batches(rules)                 # stateless threshold flagger
      -> map_batches(ScrubStage, conc=N)    # regex bank per actor
      -> (a) write_parquet(out)             # resumable layout via state/lineage
         (b) counters: per-batch partials -> tiny groupby  (no full shuffle)

Everything streams; nothing materializes the corpus. The only wide op is
the counters groupby, which runs over per-batch PARTIALS (a few rows per
batch), so the all-to-all exchange is tiny regardless of corpus size
(SURVEY.md §2.5 A6 note).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..config import PipelineConfig
from ..functions.urls import host_of_urls
from ..stages.extract import extract_batch
from ..stages.features import features_batch
from ..stages.langid import LangIdStage
from ..stages.perplexity import PerplexityStage
from ..stages.rules import make_rules_stage
from ..stages.scrub import ScrubStage

PAGES_READ_COLUMNS = ["url", "warc_ts", "html", "lang"]


def _add_host(batch: pa.Table) -> pa.Table:
    return batch.append_column("host", host_of_urls(batch.column("url")))


def read_pages(paths: str | list[str],
               num_blocks: int | None = None) -> ray.data.Dataset:
    """Column-pruned read: the ground-truth `text` column is NOT read in
    production (it exists only for fixture verification).

    `num_blocks` overrides Ray's default one-block-per-file splitting.
    Measured on the 400k-doc bench corpus (160 small files): the default
    yields ~2.5 task waves on 32 CPUs and the straggler tail of the last
    partial wave costs ~25% wall; ~2 blocks per core (whole-wave
    packing) runs the same pipeline at 2.7 s vs 3.7 s. The multi-node
    equivalent is target-block-size tuning at the read — don't let tiny
    input files dictate task granularity."""
    return ray.data.read_parquet(paths, columns=PAGES_READ_COLUMNS,
                                 override_num_blocks=num_blocks)


def build_qc_pipeline(ds: ray.data.Dataset, cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    """Compose the QC stages.

    cfg.stage_mode selects how the stateful scorers run:
      - "actors": callable classes on autoscaling actor pools (model built
        once per actor) — the shape for genuinely heavy state (big LMs,
        GPU models) where init dominates;
      - "tasks" (default): plain functions whose frozen models live in a
        per-worker-process module cache — identical init-amortization for
        these small models, but elastic across every CPU with no pool
        spin-up cost, so the whole pipeline fuses into one task chain.
        (Measured: same output, ~2x lower fixed overhead per run.)
    """
    cfg = cfg or PipelineConfig()
    kw = dict(batch_format="pyarrow", batch_size=cfg.batch_size)
    if cfg.stage_mode == "actors":
        ds = ds.map_batches(extract_batch, **kw)
        ds = ds.map_batches(_add_host, **kw)
        ds = ds.map_batches(features_batch, **kw)
        ds = ds.map_batches(LangIdStage, concurrency=cfg.langid_concurrency, num_cpus=1, **kw)
        ds = ds.map_batches(PerplexityStage, concurrency=cfg.ppl_concurrency, num_cpus=1, **kw)
        if cfg.dup_rowkeys_ref is not None:
            from ..stages.scoring import mark_dup_losers

            ds = ds.map_batches(
                lambda t, _ref=cfg.dup_rowkeys_ref: mark_dup_losers(t, _ref), **kw)
        if cfg.neardup_rowkeys_ref is not None:
            from ..stages.scoring import mark_dup_losers

            ds = ds.map_batches(
                lambda t, _ref=cfg.neardup_rowkeys_ref: mark_dup_losers(
                    t, _ref, column="is_neardup_loser"), **kw)
        if cfg.rule_banks:
            from .webtext import bank_features_batch

            ds = ds.map_batches(
                lambda t, _b=cfg.rule_banks: bank_features_batch(t, _b), **kw)
        ds = ds.map_batches(make_rules_stage(cfg.effective_rules()), **kw)
        ds = ds.map_batches(ScrubStage, concurrency=cfg.scrub_concurrency, num_cpus=1, **kw)
    else:
        from ..stages.scoring import make_qc_batch

        ds = ds.map_batches(make_qc_batch(cfg.effective_rules(),
                                          cfg.dup_rowkeys_ref,
                                          rule_banks=cfg.rule_banks,
                                          neardup_rowkeys_ref=cfg.neardup_rowkeys_ref), **kw)
    return ds


def qc_pipeline_from_parquet(paths: str | list[str], cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    return build_qc_pipeline(read_pages(paths), cfg)


def _pages_shard_count(paths: str | list[str],
                       target_bytes: int = 1 << 30,
                       floor: int = 64) -> int:
    """Bounded-shard count for shuffles over a pages corpus, sized from
    Parquet footers (same contract as docs._shard_count, but over an
    arbitrary file/dir/list input instead of an sf_dir table)."""
    import glob as _glob
    import os

    import pyarrow.parquet as _pq

    if isinstance(paths, str):
        files = (sorted(_glob.glob(os.path.join(paths, "**", "*.parquet"),
                                   recursive=True))
                 if os.path.isdir(paths) else [paths])
    else:
        files = list(paths)
    total = 0
    for f in files:
        md = _pq.ParquetFile(f).metadata
        total += sum(md.row_group(i).total_byte_size
                     for i in range(md.num_row_groups))
    return int(max(floor, -(-total // max(1, target_bytes))))


# moved to functions.urls so worker-side callers bind it at module
# level (driver-contract import safety); re-exported for callers/tests
from ..functions.urls import page_row_keys  # noqa: E402,F401


def exact_dup_loser_rowkeys_ds(paths: str | list[str],
                               cfg: PipelineConfig | None = None):
    """Pass 0 of the `--dedup` launch flow: cross-document EXACT dedup
    over the extracted text. One streamed extract pass; (row key, url,
    text) rides a bounded-shard shuffle keyed on the text's content
    hash; within a shard the (min url, min key) row of each distinct
    text wins (exact TEXT compare — a hash collision can never merge
    two documents) and every other row is a loser. Returns a streaming
    Dataset of the losers' uint64 row keys (page_row_keys: url +
    warc_ts) — O(dup rate), never the winner list; consumers either
    collect it (exact_dup_loser_rowkeys, the broadcast fast path) or
    stream it into a sharded index (exact_dup_loser_index, the
    high-dup-rate path).

    A loser whose key EQUALS its group winner's key (rows identical in
    url AND warc_ts AND text — true indistinguishable copies) is
    excluded from the drop set: dropping by that key would annihilate
    the winner too. Documented bounds: such copies are all kept
    (under-drop), and two DIFFERENT rows colliding in 64-bit key space
    would drop a non-duplicate page (p ~ n^2 / 2^64, the same accepted
    bound as the dedup index)."""
    import numpy as np
    import pandas as pd

    from ..functions.urls import fnv1a64

    cfg = cfg or PipelineConfig()
    kw = dict(batch_format="pyarrow", batch_size=cfg.batch_size)
    n_shards = _pages_shard_count(paths)
    ds = read_pages(paths).map_batches(extract_batch, **kw)

    def add_shard(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # null-text rows never participate in dedup: they carry no
        # content to compare and the null_text rule drops them anyway
        t = t.filter(pc.is_valid(t.column("text")))
        h = fnv1a64(t.column("text"))
        return pa.table({"shard": (h % np.uint64(n_shards)).astype(np.int64),
                         "key": page_row_keys(t.column("url"), t.column("warc_ts")),
                         "url": t["url"], "text": t["text"]})

    def losers(g: "pd.DataFrame") -> "pd.DataFrame":
        key = g["key"].to_numpy().astype(np.uint64)
        url = g["url"].to_numpy(dtype=object)
        text = g["text"].to_numpy(dtype=object)
        order = np.lexsort((key, url, text))  # per text: (min url, min key) wins
        key, text = key[order], text[order]
        first = np.ones(len(text), dtype=bool)
        if len(text) > 1:
            first[1:] = text[1:] != text[:-1]
        gid = np.cumsum(first) - 1
        winner_key = key[np.nonzero(first)[0]][gid]
        lose = (~first) & (key != winner_key)  # keep indistinguishable copies
        return pd.DataFrame({"key": key[lose]})

    return (ds.map_batches(add_shard, **kw)
            .groupby("shard").map_groups(losers, batch_format="pandas"))


def exact_dup_loser_rowkeys(paths: str | list[str],
                            cfg: PipelineConfig | None = None):
    """Collected sorted-uint64 twin of `exact_dup_loser_rowkeys_ds` —
    the broadcastable drop side for corpora whose dup rate keeps the
    loser set driver-sized; `exact_dup_loser_index` is the sharded-actor
    path beyond that (paths pytest-pinned identical)."""
    import numpy as np

    df = exact_dup_loser_rowkeys_ds(paths, cfg).to_pandas()
    if "key" not in df.columns:  # fully-unique corpus: no losers
        return np.zeros(0, dtype=np.uint64)
    return np.unique(df["key"].to_numpy().astype(np.uint64))


def exact_dup_loser_index(paths: str | list[str],
                          cfg: PipelineConfig | None = None,
                          n_shards: int = 8):
    """Scale path for the --dedup drop set (VERDICT r4 item 1): the
    loser row keys stream straight from the bounded-shard dedup shuffle
    into a sharded-actor membership index + 512 KiB bloom — the driver
    never holds the keys, so a high-duplicate-rate crawl cannot OOM it.
    mark_dup_losers accepts the returned DropIndex anywhere it accepts
    the broadcast key-array ref (flag values pytest-pinned equal)."""
    from ..state.dropindex import DropIndex

    idx = DropIndex(n_shards)
    # uint64 keys ride as their int64 twos-complement view — consistent
    # on both add and probe (DropIndex contract)
    idx.add_dataset(exact_dup_loser_rowkeys_ds(paths, cfg), column="key")
    return idx.seal()


def neardup_loser_rowkeys_ds(paths: str | list[str],
                             cfg: PipelineConfig | None = None,
                             jaccard_threshold: float = 0.8):
    """Pass 0 of the `--neardup` launch flow: cross-document NEAR-dup
    detection over the extracted page text (MinHash -> LSH banding ->
    exact-Jaccard verify — docs.minhash_candidate_pairs_ds fed by the
    pages extract, the NOTES 'wire near-dup into the flagship' item).
    Verified pairs at or above `jaccard_threshold` form a similarity
    graph; connected components resolve via the shared min-label CC
    (docs._cc_min_label_ds — single-task fast path under one partition,
    distributed rounds beyond), the component's min ROW KEY wins, and
    every other member is a loser. Returns a streaming Dataset of the
    losers' row keys (int64 twos-complement view of page_row_keys —
    the DropIndex/mark_dup_losers key contract).

    Notes on semantics at the boundary:
    - exact copies are near-dups with jaccard 1.0, so --neardup
      subsumes --dedup's drops (winner choice differs: min ROW KEY
      here vs min (url, key) there — both deterministic);
    - rows identical in url AND warc_ts share a row key and are ONE
      graph node; a node is a loser only when its key differs from the
      component winner's, so indistinguishable copies can only drop
      together IN FAVOR OF a surviving distinct winner — the content
      always keeps at least one copy (same guarantee as the exact-dup
      pass, enforced here by construction)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .docs import _cc_min_label_ds, minhash_candidate_pairs_ds

    cfg = cfg or PipelineConfig()
    kw = dict(batch_format="pyarrow", batch_size=cfg.batch_size)
    n_shards = _pages_shard_count(paths)

    def pages_as_docs() -> ray.data.Dataset:
        from ..functions import textstats as ts  # driver-side: adapt runs on workers

        def adapt(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t.column("text")))
            texts = t.column("text")
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            # pages with < 3 tokens carry no 3-gram shingles; their
            # empty sets would all be mutually Jaccard-1 "near-dups",
            # so they are excluded from the graph — the length rules
            # own them, near-dup dedup never fires on them
            n_tok = np.diff(ts.tokenize(texts).offsets)
            t = t.filter(pa.array(n_tok >= 3))
            keys = page_row_keys(t.column("url"), t.column("warc_ts"))
            return pa.table({"doc_id": keys.view(np.int64), "text": t["text"]})

        return (read_pages(paths).map_batches(extract_batch, **kw)
                .map_batches(adapt, **kw))

    pairs = minhash_candidate_pairs_ds(pages_as_docs, n_shards,
                                       jaccard_threshold)
    empty = pa.table({"key": pa.array([], pa.int64())})
    if len(pairs) == 0:
        return ray.data.from_arrow(empty)
    edges_pd = pd.DataFrame({
        "src": np.concatenate([pairs["id_a"].to_numpy(),
                               pairs["id_b"].to_numpy()]).astype(np.int64),
        "dst": np.concatenate([pairs["id_b"].to_numpy(),
                               pairs["id_a"].to_numpy()]).astype(np.int64),
    })
    labels, _ = _cc_min_label_ds(edges_pd)

    def losers(t: pa.Table) -> pa.Table:
        node = np.asarray(t["node"], dtype=np.int64)
        label = np.asarray(t["label"], dtype=np.int64)
        return pa.table({"key": node[node != label]})

    out = labels.map_batches(losers, batch_format="pyarrow")
    return out if out.count() else ray.data.from_arrow(empty)


def neardup_loser_rowkeys(paths: str | list[str],
                          cfg: PipelineConfig | None = None,
                          jaccard_threshold: float = 0.8):
    """Collected sorted-uint64 twin of neardup_loser_rowkeys_ds — the
    broadcastable drop side (mirrors exact_dup_loser_rowkeys)."""
    import numpy as np

    df = neardup_loser_rowkeys_ds(paths, cfg, jaccard_threshold).to_pandas()
    if "key" not in df.columns:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(df["key"].to_numpy().astype(np.int64).view(np.uint64))


def neardup_loser_index(paths: str | list[str],
                        cfg: PipelineConfig | None = None,
                        jaccard_threshold: float = 0.8, n_shards: int = 8):
    """Sharded-actor form of the near-dup drop set (mirrors
    exact_dup_loser_index; flag values pytest-pinned equal to the
    broadcast form)."""
    from ..state.dropindex import DropIndex

    idx = DropIndex(n_shards)
    idx.add_dataset(neardup_loser_rowkeys_ds(paths, cfg, jaccard_threshold),
                    column="key")
    return idx.seal()


def qc_label_documents(sf_dir: str, cfg: PipelineConfig | None = None,
                       calibrate: bool = True) -> ray.data.Dataset:
    """The QC stack over the driver's `documents` table (no html, so the
    extract stage is skipped): features -> langid -> ppl -> CALIBRATE ->
    rules -> scrub. Stands in for `pages` in smoke/correctness runs
    (FIXTURES.md F4).

    This is the reference's full E2 two-pass flow (Home.py:326-372):
    the calibratable rules (percentile/tukey per RuleSpec.calibration)
    recompute their thresholds FROM THIS CORPUS in pass 1 — the fixed
    defaults are tuned for web pages, and a corpus with a different
    feature distribution would otherwise flag everything (observed:
    keep rate 0.0 on the synthetic documents table under fixed
    thresholds). The scored dataset is materialized once (object-store,
    spillable) because calibration and flagging both consume it; the
    single-process golden applies the identical np.nanpercentile
    calibration, so the two-pass flow itself is value-checked."""
    cfg = cfg or PipelineConfig()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang", "source"])

    def adapt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        url = pc.binary_join_element_wise(
            pa.array(["doc://"] * batch.num_rows), pc.cast(batch["doc_id"], pa.string()), "")
        return pa.table({
            "url": url,
            "doc_id": batch["doc_id"],
            "host": batch["source"],
            "lang": batch["lang"],
            "text": batch["text"],
        })

    kw = dict(batch_format="pyarrow", batch_size=cfg.batch_size)
    ds = ds.map_batches(adapt, **kw)
    ds = ds.map_batches(features_batch, **kw)
    ds = ds.map_batches(LangIdStage, concurrency=cfg.langid_concurrency, num_cpus=1, **kw)
    ds = ds.map_batches(PerplexityStage, concurrency=cfg.ppl_concurrency, num_cpus=1, **kw)
    rules = cfg.rules
    if calibrate:
        from .calibrate import calibrate_rules

        ds = ds.materialize()  # pass 1 (calibration) + pass 2 (flag) both read it
        rules = calibrate_rules(ds, rules,
                                exact=cfg.calibration_mode == "exact")
    ds = ds.map_batches(make_rules_stage(rules), **kw)
    ds = ds.map_batches(ScrubStage, concurrency=cfg.scrub_concurrency, num_cpus=1, **kw)
    # list columns don't survive every downstream consumer (pandas hashing);
    # project rule_flags away for the tabular consumers, keep bool columns
    return ds.drop_columns(["rule_flags"])
