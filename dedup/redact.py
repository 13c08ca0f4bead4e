"""PII redaction over the text column (corpus-cleaning stage).

Masks emails, IPv4 addresses and phone-like digit runs with typed
placeholder tokens and reports per-document match counts — the
CCNet/FineWeb-style PII scrub applied before a web corpus is released
or trained on. No reference analogue (filesystem dedup has no text
rewriting); the vectorized shape mirrors ``ingest``'s url gate.

Both sides of the oracle speak RE2: Arrow's ``replace_substring_regex``
/ ``count_substring_regex`` here, DuckDB's ``regexp_replace(..., 'g')``
/ ``len(regexp_extract_all(...))`` in SQL — same engine, same
semantics, so the redacted text is reproducible exactly.

Patterns apply IN ORDER, each counting and replacing on the output of
the previous one (an email's host can otherwise double-count as a
phoneish digit run); the SQL oracle nests its replacements in the same
order.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# (name, RE2 pattern, replacement) — order matters; see module doc
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    # case-insensitive classes spelled out (no (?i): the pattern must
    # parse identically under Arrow RE2 and DuckDB's regexp_replace) —
    # redaction runs on RAW text, and a lowercase-only class left
    # 'John.Doe@Example.com' unredacted in the released corpus
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
)


class Redactor:
    """Callable for ``map_batches``: text → redacted text + counts."""

    def __init__(self, patterns=PII_PATTERNS, text_col: str = "text"):
        self.patterns = tuple(patterns)
        self.text_col = text_col
        # fail fast on a non-RE2 pattern (same probe as ingest's url gate)
        for _, pat, _ in self.patterns:
            pc.match_substring_regex(pa.array([""], pa.string()), pat)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        cur = pc.fill_null(text, "")
        out = batch.drop_columns([self.text_col])
        for name, pat, repl in self.patterns:
            cnt = pc.count_substring_regex(cur, pat)
            out = out.append_column(f"n_{name}", cnt.cast(pa.int64()))
            cur = pc.replace_substring_regex(cur, pat, repl)
        return out.append_column("text_redacted", cur)


def redact_pii(docs: Dataset, patterns=PII_PATTERNS, text_col: str = "text") -> Dataset:
    """(…, text) rows → (…, n_<type> per pattern, text_redacted)."""
    return docs.map_batches(
        Redactor(patterns, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
