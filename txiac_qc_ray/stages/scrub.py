"""Compiled-regex PII / toxicity scrubbing (scrub = transform, not drop).

Actor-pool `map_batches` stage: the pattern bank is compiled once per
actor in __init__ (SURVEY.md §2.3 ST-new) and applied with pyarrow's
vectorized RE2 kernel `pc.replace_substring_regex` — no Python loop.

Pattern order is FROZEN (golden fixtures pin it): email, phone, ssn,
ipv4, toxicity. Replacements are applied sequentially so e.g. the IPv4
pattern can never re-match inside an already-replaced email.

Reference analog: there is no scrub in the reference (it only flags);
this is the `action: scrub` arm of the declarative rule-set required by
north_rule ("regex scrub transforms").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..vocab import TOXICITY_LEXICON

# (name, RE2 pattern, replacement) — FROZEN order.
SCRUB_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\(\d{3}\)\s?\d{3}-\d{4}", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("toxicity", r"(?i)\b(?:" + "|".join(TOXICITY_LEXICON) + r")\b", "<TOX>"),
)


# every scrub pattern requires a digit or '@' or a lexicon word; one cheap
# RE2 scan finds candidate docs so the 5 replace passes touch only those
_CANDIDATE_RE = r"(?i)[0-9@]|\b(?:" + "|".join(TOXICITY_LEXICON) + r")\b"


def scrub_texts(texts: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """-> (scrubbed: string array, changed: bool ndarray). Nulls stay null.

    Pre-filters with a single candidate scan (most web docs carry no PII)
    then runs the 5 replacement passes only over the candidate subset —
    results are byte-identical to scrubbing every row (a non-candidate
    can't match any pattern)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    cand = np.asarray(pc.fill_null(pc.match_substring_regex(texts, _CANDIDATE_RE), False))
    if not cand.any():
        return texts, np.zeros(len(texts), dtype=bool)
    sub = texts.filter(pa.array(cand))
    for _name, pat, repl in SCRUB_PATTERNS:
        sub = pc.replace_substring_regex(sub, pattern=pat, replacement=repl)
    if isinstance(sub, pa.ChunkedArray):
        sub = sub.combine_chunks()
    out_np = np.asarray(texts.to_pandas(), dtype=object)
    sub_np = np.asarray(sub.to_pandas(), dtype=object)
    changed_sub = np.asarray(pc.fill_null(pc.not_equal(sub, texts.filter(pa.array(cand))), False))
    out_np[cand] = sub_np
    out = pa.array(out_np, type=pa.string())
    changed = np.zeros(len(texts), dtype=bool)
    changed[cand] = changed_sub
    return out, changed


class ScrubStage:
    """`ds.map_batches(ScrubStage, concurrency=N)` — adds
    `scrubbed_text` (null for dropped docs) and `scrubbed: bool`.

    Requires the `keep` column (rules stage runs first): only kept docs
    carry scrubbed text, mirroring FIXTURES.md F2.
    """

    def __init__(self) -> None:
        # RE2 programs live inside Arrow; nothing heavy to precompile here,
        # but an actor pool still amortizes kernel dispatch setup and keeps
        # the stage shape uniform with the other scorers.
        self.patterns = SCRUB_PATTERNS

    def __call__(self, batch: pa.Table) -> pa.Table:
        scrubbed, changed = scrub_texts(batch.column("text"))
        keep = np.asarray(pc.fill_null(batch.column("keep").combine_chunks()
                                       if isinstance(batch.column("keep"), pa.ChunkedArray)
                                       else batch.column("keep"), False))
        drop_mask = ~keep
        if drop_mask.any():
            scrubbed_np = np.asarray(scrubbed.to_pandas(), dtype=object)
            scrubbed_np[drop_mask] = None
            scrubbed = pa.array(scrubbed_np, type=pa.string())
            changed = changed & keep
        batch = batch.append_column("scrubbed_text", scrubbed)
        return batch.append_column("scrubbed", pa.array(changed, type=pa.bool_()))


_SCRUB_SINGLETON = ScrubStage()


def scrub_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task variant of ScrubStage (RE2 programs live inside
    Arrow; nothing heavy to re-init per task)."""
    return _SCRUB_SINGLETON(batch)
