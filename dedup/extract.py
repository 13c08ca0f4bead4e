"""HTML → text extraction over Common-Crawl-style pages.

The north-rule input table carries ``html: binary`` alongside the
extracted ``text: string`` and demands byte-identical extracted text
per url. This module is the extraction stage itself: decode the raw
bytes, strip scripts/styles/comments/tags, decode the common entities
and normalize whitespace — the trafilatura/jusText-shaped step every
web-corpus pipeline runs before dedup. (No reference analogue: the
filesystem tool never parses content, /root/reference/src/process_matches.rs
hashes bytes as-is. The vectorized shape mirrors ``redact.py``.)

Both sides of the oracle speak RE2: the rule chain below runs through
Arrow ``replace_substring_regex`` / ``replace_substring`` here and is
regenerated as nested ``regexp_replace(..., 'g')`` / ``replace`` SQL by
``extract_sql`` — same engine, same order, so extracted text matches
DuckDB exactly.

UTF-8 handling is corruption-proportional: the whole batch is cast in
one vectorized attempt; only when it contains invalid bytes do we walk
the *error positions* (one ``codecs`` probe per invalid sequence, never
per row) and splice repaired bytes for just the affected rows, keeping
the valid spans as zero-copy numpy slices.
"""

from __future__ import annotations

import codecs

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# (name, pattern-or-literal, replacement, is_regex) — applied IN ORDER.
# Script/style/comment bodies go first (their content must never leak
# into text), block-level tags become newlines, remaining tags spaces;
# entities decode after tags are gone (&lt; must not create new "tags")
# with &amp; last, per the standard unescape order; whitespace
# normalization runs last so the output is stable under re-extraction.
EXTRACT_RULES: tuple[tuple[str, str, str, bool], ...] = (
    ("script", r"(?is)<script\b[^>]*>.*?</script>", " ", True),
    ("style", r"(?is)<style\b[^>]*>.*?</style>", " ", True),
    ("comment", r"(?s)<!--.*?-->", " ", True),
    (
        "block",
        r"(?i)</?(?:p|br|div|li|ul|ol|h[1-6]|tr|table|blockquote|section|article)\b[^>]*>",
        "\n",
        True,
    ),
    ("tag", r"(?s)<[^>]*>", " ", True),
    ("ent_lt", "&lt;", "<", False),
    ("ent_gt", "&gt;", ">", False),
    ("ent_quot", "&quot;", '"', False),
    ("ent_apos", "&#39;", "'", False),
    ("ent_nbsp", "&nbsp;", " ", False),
    ("ent_amp", "&amp;", "&", False),
    ("ws_space", r"[^\S\n]+", " ", True),
    ("ws_nl", r" ?\n ?", "\n", True),
    ("ws_nlrun", r"\n{3,}", "\n\n", True),
    ("trim", r"^\s+|\s+$", "", True),
)


def decode_utf8_column(arr: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """binary column → (string column, per-row utf8-valid bool mask).

    Invalid rows are decoded with U+FFFD replacement. Fast path: one
    Arrow cast when the whole column is valid; otherwise pure-ASCII
    rows are proven valid vectorized and only rows containing a byte
    >= 0x80 pay a per-row strict decode. Handles both 32-bit
    (binary/string) and 64-bit (large_*) offset layouts.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, b"")
    n = len(arr)
    # offset width follows the layout: binary/string carry int32
    # offsets, large_binary/large_string int64 — reading a large
    # column's offsets as int32 yields garbage slice bounds (and an
    # uncatchable std::length_error abort downstream)
    is_large = pa.types.is_large_binary(arr.type) or pa.types.is_large_string(
        arr.type
    )
    tgt = pa.large_string() if is_large else pa.string()
    try:
        return arr.cast(tgt), np.ones(n, bool)
    except pa.ArrowInvalid:
        pass
    odt = np.int64 if is_large else np.int32
    off = np.frombuffer(arr.buffers()[1], odt)[arr.offset : arr.offset + n + 1]
    mv = memoryview(arr.buffers()[2])[off[0] : off[-1]]
    roff = (off - off[0]).astype(np.int64)
    # PER-ROW strict validation. Scanning the CONCATENATED buffer is
    # unsound: a multibyte sequence split across a row boundary
    # (b"ab\\xc3" | b"\\xa9cd") reads as valid bytes even though both
    # rows are invalid. Pure-ASCII rows (the overwhelming majority)
    # are proven valid vectorized; only rows containing a byte >= 0x80
    # pay the per-row decode attempt.
    raw0 = np.frombuffer(mv, np.uint8)
    valid = np.ones(n, bool)
    if len(raw0):
        nonempty = np.flatnonzero(np.diff(roff) > 0)
        if len(nonempty):
            hi = raw0 >= 0x80
            has_hi = np.add.reduceat(hi, roff[nonempty]) > 0
            for i in nonempty[has_hi]:
                try:
                    codecs.utf_8_decode(mv[roff[i] : roff[i + 1]], "strict", True)
                except UnicodeDecodeError:
                    valid[i] = False
    bad_rows = np.flatnonzero(~valid)
    # splice: valid spans between bad rows stay as buffer slices; bad
    # rows are re-encoded with replacement chars (len may change)
    raw = np.frombuffer(mv, np.uint8)
    lens = np.diff(roff)
    segs: list[np.ndarray] = []
    prev = 0
    for r in bad_rows:
        r = int(r)
        if roff[r] > prev:
            segs.append(raw[prev : roff[r]])
        fixed = bytes(mv[roff[r] : roff[r + 1]]).decode("utf-8", "replace").encode()
        segs.append(np.frombuffer(fixed, np.uint8))
        lens[r] = len(fixed)
        prev = int(roff[r + 1])
    if prev < len(raw):
        segs.append(raw[prev:])
    new_values = np.concatenate(segs) if segs else np.empty(0, np.uint8)
    new_off = np.empty(n + 1, np.int64 if is_large else np.int32)
    new_off[0] = 0
    np.cumsum(lens, out=new_off[1:])
    out = pa.Array.from_buffers(
        tgt,
        n,
        [None, pa.py_buffer(new_off.tobytes()), pa.py_buffer(new_values.tobytes())],
    )
    return out, valid


def apply_rules(text: pa.Array, rules=EXTRACT_RULES) -> pa.Array:
    cur = text
    for _, pat, repl, is_re in rules:
        if is_re:
            cur = pc.replace_substring_regex(cur, pat, repl)
        else:
            cur = pc.replace_substring(cur, pat, repl)
    return cur


class Extractor:
    """Callable for ``map_batches``: html bytes → extracted text."""

    def __init__(
        self,
        html_col: str = "html",
        out_col: str = "extracted",
        rules=EXTRACT_RULES,
    ):
        self.html_col, self.out_col, self.rules = html_col, out_col, tuple(rules)
        for _, pat, _, is_re in self.rules:  # fail fast on non-RE2 patterns
            if is_re:
                pc.replace_substring_regex(pa.array([""], pa.string()), pat, "")

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.html_col)
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            s, valid = decode_utf8_column(col)
        else:
            s = pc.fill_null(
                col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col, ""
            )
            valid = np.ones(len(batch), bool)
        out = batch.drop_columns([self.html_col])
        out = out.append_column(self.out_col, apply_rules(s, self.rules))
        return out.append_column("utf8_valid", pa.array(valid.astype(np.int64), pa.int64()))


def extract_text(
    pages: Dataset, html_col: str = "html", out_col: str = "extracted"
) -> Dataset:
    """(…, html) rows → (…, extracted, utf8_valid) rows."""
    return pages.map_batches(
        Extractor(html_col, out_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _sql_str(s: str) -> str:
    """A DuckDB E'…' literal for a pattern/replacement string."""
    esc = s.replace("\\", "\\\\").replace("'", "''").replace("\n", "\\n")
    return f"E'{esc}'"


def extract_sql(expr: str, rules=EXTRACT_RULES) -> str:
    """Nest the rule chain around a SQL string expression (oracle side)."""
    cur = expr
    for _, pat, repl, is_re in rules:
        if is_re:
            cur = f"regexp_replace({cur}, {_sql_str(pat)}, {_sql_str(repl)}, 'g')"
        else:
            cur = f"replace({cur}, {_sql_str(pat)}, {_sql_str(repl)})"
    return cur
