"""Declarative QC rule-set and pipeline configuration.

This plays the role the reference's configuration dicts play
(`perf_indx_list` Home.py:22-30, the sidebar-built `thresholds: {item:
[lo, hi]}` dict Home.py:334-365) — but as an explicit, typed rule list
instead of name-convention magic (SURVEY.md §2.9).

Rule shapes mirror the reference's two flagger modes exactly
(thre_filter, Home.py:176-183):
  - ``abs_ge``   : fire when abs(feature) >= hi          (Audit shape, H:178)
  - ``two_sided``: fire when feature >= hi or <= lo      (Year-by-year, H:181)
plus the additional shapes a web-text quality filter needs (lt / gt /
outside / is_null / ne_str). NaN never fires a rule (pandas .loc
semantics, H:178 with NaN diffs).

The reference *keeps* flagged rows (outliers are the product there,
H:183); this pipeline *drops* them (`keep = not any(flag)`) — same
predicate algebra, inverted selection (SURVEY.md §2.2 M4).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class RuleSpec:
    name: str
    feature: str
    kind: str  # is_null | lt | gt | outside | abs_ge | two_sided | ne_str
    lo: float | None = None
    hi: float | None = None
    value: str | None = None  # for ne_str
    # how A1-style calibration may recompute lo/hi: none | percentile | tukey
    calibration: str = "none"


# Frozen default rule-set. ORDER MATTERS: drop_reason is the first firing
# rule; golden fixtures pin this exact order.
DEFAULT_RULES: tuple[RuleSpec, ...] = (
    RuleSpec("null_text", "text", "is_null"),
    RuleSpec("too_short", "n_words", "lt", lo=50.0),
    RuleSpec("non_english", "lang_pred", "ne_str", value="en"),
    RuleSpec("high_symbol_ratio", "symbol_word_ratio", "gt", hi=0.1),
    RuleSpec("low_stopword_ratio", "stopword_ratio", "lt", lo=0.05),
    RuleSpec("mean_word_len_out", "mean_word_len", "outside", lo=2.0, hi=12.0),
    RuleSpec("high_repetition_3gram", "frac_top_3gram", "gt", hi=0.18,
             calibration="percentile"),
    RuleSpec("dup_paragraphs", "dup_para_frac", "gt", hi=0.30),
    RuleSpec("high_perplexity", "ppl", "gt", hi=2000.0, calibration="tukey"),
)

# Cross-document exact-dup drop rule for the two-pass --dedup launch
# flow (qc.exact_dup_loser_rowkeys marks losers in `is_dup_loser`).
# Appended AFTER the default rules when --dedup is on, so the frozen
# drop_reason order of the golden fixtures is untouched.
DEDUP_RULE = RuleSpec("exact_duplicate", "is_dup_loser", "gt", hi=0.5)

# Cross-document NEAR-dup drop rule for the --neardup launch flow
# (qc.neardup_loser_rowkeys marks MinHash-LSH component losers in
# `is_neardup_loser`). Appended after the defaults like DEDUP_RULE.
NEARDUP_RULE = RuleSpec("near_duplicate", "is_neardup_loser", "gt", hi=0.5)

# Published web-text rule banks (pipelines/webtext.py) as optional
# flagship drop rules: PipelineConfig.rule_banks selects them; the
# feature stage appends one float 0/1 `<bank>_keep` column per bank and
# these rules fire on keep < 0.5. Appended AFTER the default rules so
# the frozen golden drop_reason order is untouched when banks are off.
RULE_BANK_RULES: dict[str, RuleSpec] = {
    "c4": RuleSpec("c4_dropped", "c4_keep", "lt", lo=0.5),
    "gopher": RuleSpec("gopher_dropped", "gopher_keep", "lt", lo=0.5),
    "repetition": RuleSpec("repetition_dropped", "repetition_keep",
                           "lt", lo=0.5),
    "url": RuleSpec("url_dropped", "url_keep", "lt", lo=0.5),
    "classifier": RuleSpec("classifier_dropped", "classifier_keep",
                           "lt", lo=0.5),
    "fineweb": RuleSpec("fineweb_dropped", "fineweb_keep", "lt", lo=0.5),
}

# Feature columns the feature stage emits (all float64 unless noted).
FEATURE_COLUMNS: tuple[str, ...] = (
    "n_words",
    "n_chars",
    "mean_word_len",
    "stopword_ratio",
    "symbol_word_ratio",
    "frac_top_3gram",
    "dup_para_frac",
)

# Langid: minimum vocabulary-match ratio to claim a language at all.
LANGID_MIN_SCORE = 0.15
LANGID_LANGS: tuple[str, ...] = ("en", "de", "fr", "es")  # fixed tie-break order
LANGID_UNKNOWN = "und"

# Perplexity model
PPL_OOV_LOGP = -13.815510557964274  # log(1e-6), frozen constant


@dataclass
class PipelineConfig:
    rules: tuple[RuleSpec, ...] = DEFAULT_RULES
    batch_size: int = 4096  # rows per batch; pages rows are ~1-4 KB of text, so a
    # batch is ~4-16 MB — large enough to amortize Arrow kernel dispatch,
    # small enough that batch x concurrency fits worker heaps
    # Actor-pool sizes as (min, max): autoscaling pools with min=1 so the
    # three stateful stages can never deadlock each other on a small CPU
    # budget (each pool eagerly reserves `min` CPUs; fixed pools summing
    # past the node's CPUs would stall the pipeline forever).
    langid_concurrency: tuple[int, int] | int = (1, 4)
    ppl_concurrency: tuple[int, int] | int = (1, 4)
    scrub_concurrency: tuple[int, int] | int = (1, 4)
    # "tasks": scorers as plain fns with per-process model caches (elastic,
    # no pool spin-up); "actors": explicit autoscaling actor pools.
    stage_mode: str = "tasks"
    # "exact" collects the calibratable feature columns for exact
    # percentiles (right at fixture scale, O(rows) driver memory);
    # "sketch" uses per-block t-digest partials — the beyond-driver-RAM
    # path for corpus-scale calibration
    calibration_mode: str = "exact"
    counter_dims: tuple[str, ...] = ("lang_pred", "drop_reason", "host")
    # ray.put ObjectRef of the sorted uint64 url-hash drop set from the
    # --dedup pass 0 (qc.exact_dup_loser_rowkeys); None = dedup off.
    # Carrying the REF (not the array) keeps PipelineConfig cheap to
    # ship into every task; each batch reads it zero-copy from the
    # object store.
    dup_rowkeys_ref: object = None
    # Same contract for the --neardup pass 0 drop set
    # (qc.neardup_loser_rowkeys / neardup_loser_index); None = off.
    neardup_rowkeys_ref: object = None
    # Opt-in published web-text rule banks (keys of RULE_BANK_RULES);
    # () = off, the golden-pinned default.
    rule_banks: tuple[str, ...] = ()
    extra: dict = field(default_factory=dict)

    def effective_rules(self) -> tuple[RuleSpec, ...]:
        """cfg.rules plus one appended RuleSpec per requested bank."""
        return self.rules + tuple(RULE_BANK_RULES[b] for b in self.rule_banks)
