"""Text-analysis operators for training-data pipelines.

Token counting, per-document stats, stopword-based quality signals, a
deterministic language-ID heuristic, and global token frequencies — all
vectorized per batch (Arrow compute + numpy segment ops; no per-row
Python) so they hold up at 100 TB.

Everything here is definitionally mirrored by the DuckDB oracle SQL in
``dedup/queries.py`` — the SQL is *generated from the same constants*
(``TOKEN_SPLIT_RE``, ``STOPWORDS``) so the two can't drift.

Reference anchor: the reference computes only file-size "stats"
(/root/reference/src/types.rs:27-47); these operators are the web-text
generalization of its per-record cheap keys, per the build brief's
training-data-pipeline requirements.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

# Shared token definition (ASCII word chars on lowered text). DuckDB's
# regexp_split_to_array with the same pattern yields identical tokens for
# ASCII text; keep the class explicit (not \W) so semantics match exactly.
TOKEN_SPLIT_RE = r"[^a-z0-9_]+"

# frozen stopword lists (alphabetical language order matters: argmax
# tie-break is first-in-alphabetical-order)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "en": ("the", "a", "an", "of", "and", "to", "in", "is", "it", "that"),
    "es": ("el", "los", "las", "y", "es", "un", "una", "en", "de", "que"),
    "fr": ("le", "la", "les", "et", "est", "une", "des", "du", "que", "il"),
}
LANGS = tuple(sorted(STOPWORDS))  # ("de", "en", "es", "fr")

# quality gate constants (integer comparisons only — oracle-safe)
QUALITY_MIN_TOKENS = 20
QUALITY_STOP_NUM = 1  # quality requires n_stop_best * DEN >= n_tokens * NUM
QUALITY_STOP_DEN = 20  # i.e. best-language stopword ratio >= 1/20


# byte classes for the fast tokenizer: a token byte is [A-Za-z0-9_]
# (upper-case included so the class test runs BEFORE lowering — only the
# ~85% kept token bytes then need the +32 lower-case fixup, not the whole
# buffer), exactly the ASCII projection of TOKEN_SPLIT_RE's complement.
_TOKEN_BYTE = np.zeros(256, dtype=bool)
_TOKEN_BYTE[
    np.frombuffer(
        b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_",
        np.uint8,
    )
] = True


def _tokenize_regex(text: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Definitional tokenizer: lower + TOKEN_SPLIT_RE split, drop empties.

    This is the form the DuckDB oracle SQL mirrors verbatim; the byte-scan
    fast path below must (and is tested to) agree with it on every batch
    it accepts."""
    lowered = pc.utf8_lower(pc.fill_null(text, ""))
    toks = pc.split_pattern_regex(lowered, TOKEN_SPLIT_RE)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = pc.binary_length(flat).to_numpy(zero_copy_only=False)
    keep = lens > 0
    cs = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
    counts = cs[offsets[1:]] - cs[offsets[:-1]]
    flat_kept = flat.filter(pa.array(keep)) if not keep.all() else flat
    return flat_kept, counts


def _fast_ascii_tokens(text: pa.Array) -> "tuple[pa.Array, np.ndarray] | None":
    """Byte-scan tokenizer for pure-ASCII batches; ``None`` = caller must
    fall back to its definitional regex path.

    For pure-ASCII text, splitting lowered text on ``[^a-z0-9_]+`` —
    and equally on ``\\W+``, whose ASCII projection is the same class —
    is exactly a byte-class scan (every non-ASCII code point, and every
    byte of its UTF-8 encoding, falls outside the class, so boundaries
    coincide), done here as one LUT gather + transition masks, ~3× the
    RE2 split's throughput. Any batch containing a byte >= 0x80 returns
    None: Unicode case-folding (e.g. U+212A KELVIN SIGN → 'k') and
    Unicode word chars are the caller's regex's business. Parity is
    pinned in tests/test_textstats.py."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if text.null_count:
        text = pc.fill_null(text, "")
    n_docs = len(text)
    if n_docs == 0:
        return pa.array([], pa.string()), np.zeros(0, np.int64)
    if pa.types.is_large_string(text.type):
        off_dtype = np.int64
    elif pa.types.is_string(text.type):
        off_dtype = np.int32
    else:  # dictionary / view types: let the kernel pipeline handle them
        return None
    bufs = text.buffers()
    if bufs[2] is None:  # all-empty values buffer may be absent
        return pa.array([], pa.string()), np.zeros(n_docs, np.int64)
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        text.offset : text.offset + n_docs + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]]
    if len(data) and int(data.max()) >= 0x80:
        return None
    offs = offs - offs[0]
    n = len(data)
    if n == 0:
        return pa.array([], pa.string()), np.zeros(n_docs, np.int64)
    is_tok = _TOKEN_BYTE[data]
    start_mask = is_tok.copy()
    start_mask[1:] &= ~is_tok[:-1]
    end_mask = is_tok.copy()
    end_mask[:-1] &= ~is_tok[1:]
    # a token never spans documents: force a break at every doc boundary
    # whose both sides are token bytes
    b = offs[1:-1]
    b = b[(b > 0) & (b < n)]
    inner = b[is_tok[b] & is_tok[b - 1]]
    start_mask[inner] = True
    end_mask[inner - 1] = True
    starts = np.flatnonzero(start_mask)
    tlen = (np.flatnonzero(end_mask) + 1) - starts
    counts = np.searchsorted(starts, offs[1:]) - np.searchsorted(starts, offs[:-1])
    kept = data[is_tok]
    if len(kept) >= np.iinfo(np.int32).max:  # int32 output offsets
        return None
    # lower-case only the kept token bytes (A-Z +32); separators are gone
    up = (kept >= 0x41) & (kept <= 0x5A)
    if up.any():
        kept = kept + np.where(up, np.uint8(0x20), np.uint8(0))
    toffs = np.empty(len(tlen) + 1, np.int32)
    toffs[0] = 0
    np.cumsum(tlen, out=toffs[1:])
    flat = pa.StringArray.from_buffers(
        len(tlen), pa.py_buffer(toffs.tobytes()), pa.py_buffer(kept.tobytes())
    )
    return flat, counts


def _tokenize(text: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """text column → (flat non-empty lowered tokens, tokens-per-doc).

    Byte-scan fast path for pure-ASCII batches (``_fast_ascii_tokens``),
    regex fallback otherwise — never a semantic change."""
    fast = _fast_ascii_tokens(text)
    return fast if fast is not None else _tokenize_regex(text)


def _segment_sum(flags: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Sum boolean/int ``flags`` (aligned with flat tokens) per document."""
    out = np.zeros(len(counts), dtype=np.int64)
    nz = counts > 0
    if nz.any():
        starts = (np.cumsum(counts) - counts)[nz]
        out[nz] = np.add.reduceat(flags.astype(np.int64), starts)
    return out


def _segment_nunique(token_hashes: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Distinct-token count per document (vectorized: one global sort of
    (doc, hash) pairs, then boundary counting)."""
    n_docs = len(counts)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    order = np.lexsort((token_hashes, doc_of))
    d = doc_of[order]
    h = token_hashes[order]
    new = np.ones(len(d), dtype=np.int64)
    if len(d) > 1:
        new[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    out = np.zeros(n_docs, dtype=np.int64)
    if len(d):
        # d is sorted post-lexsort, so this is a segment reduction:
        # reduceat over run starts (np.add.at's unbuffered scatter is
        # ~10x slower on this shape — same conversion as SimHasher's)
        starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
        out[d[starts]] = np.add.reduceat(new, starts)
    return out


class TextStatser:
    """map_batches callable: per-doc token/byte/shingle/stopword stats.

    Input: (id_col, text). Output: id_col, n_bytes, n_tokens, n_shingles,
    n_distinct_tokens, plus n_stop_<lang> per language, pred_lang, and an
    integer quality flag.
    """

    def __init__(
        self, id_col: str = "doc_id", shingle_k: int = 5,
        flags_only: bool = False,
    ):
        # identity-proxy hash for the per-doc distinct count only — never
        # persisted, never oracle-compared, so the fast polars Rust xxhash
        # (when present) is safe; same policy as jaccard/lines/substr.
        from .minhash import DEFAULT_TOKEN_HASH, _hash_tokens

        self.id_col = id_col
        self.k = shingle_k
        # flags_only: compute ONLY what is_quality needs (token counts +
        # stopword segment sums) — quality_filter discards everything
        # else, and the skipped token hashing + global (doc, hash)
        # lexsort are the kernel's dominant cost per batch
        self.flags_only = flags_only
        self._hash = lambda flat: _hash_tokens(flat, DEFAULT_TOKEN_HASH)
        self.stop_arrays = {
            lang: pa.array(sorted(words)) for lang, words in STOPWORDS.items()
        }

    def _quality(self, flat: pa.Array, counts: np.ndarray):
        """(per-lang stopword score matrix, best-lang idx, best score,
        quality mask) — the shared core of both output modes."""
        scores = np.zeros((len(LANGS), len(counts)), dtype=np.int64)
        for i, lang in enumerate(LANGS):
            hit = pc.is_in(flat, value_set=self.stop_arrays[lang])
            hits = hit.to_numpy(zero_copy_only=False).astype(bool)
            scores[i] = _segment_sum(hits, counts)
        best = np.argmax(scores, axis=0)  # first max = alphabetical tie-break
        best_score = scores[best, np.arange(scores.shape[1])]
        quality = (counts >= QUALITY_MIN_TOKENS) & (
            best_score * QUALITY_STOP_DEN >= counts * QUALITY_STOP_NUM
        )
        return scores, best, best_score, quality

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat, counts = _tokenize(text)
        if self.flags_only:
            _, _, _, quality = self._quality(flat, counts)
            return pa.table(
                {"is_quality": pa.array(quality.astype(np.int64), pa.int64())}
            )
        from .hashing import utf8_lengths

        n_bytes = utf8_lengths(text)
        k = self.k
        n_shingles = np.where(
            counts >= k, counts - k + 1, np.where(counts > 0, 1, 0)
        ).astype(np.int64)
        th = (
            self._hash(flat).view(np.int64)
            if len(flat)
            else np.empty(0, np.int64)
        )
        n_distinct = _segment_nunique(th, counts)

        cols = {
            self.id_col: batch.column(self.id_col),
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "n_tokens": pa.array(counts, pa.int64()),
            "n_shingles": pa.array(n_shingles, pa.int64()),
            "n_distinct_tokens": pa.array(n_distinct, pa.int64()),
        }
        scores, best, best_score, quality = self._quality(flat, counts)
        for i, lang in enumerate(LANGS):
            cols[f"n_stop_{lang}"] = pa.array(scores[i], pa.int64())
        pred = np.array(LANGS, dtype=object)[best]
        pred[best_score == 0] = "unknown"
        cols["pred_lang"] = pa.array(pred.tolist(), pa.string())
        cols["is_quality"] = pa.array(quality.astype(np.int64), pa.int64())
        return pa.table(cols)


def text_stats(ds: Dataset, id_col: str = "doc_id", shingle_k: int = 5) -> Dataset:
    """Per-document stats table (narrow output; text never leaves the map)."""
    return ds.map_batches(
        TextStatser(id_col, shingle_k), batch_format="pyarrow", zero_copy_batch=True
    )


def quality_filter(ds: Dataset, id_col: str = "doc_id") -> Dataset:
    """Keep only quality rows (is_quality == 1), preserving all input
    columns — the same vectorized per-batch kernel as ``text_stats``,
    used as a row filter inside cleaning pipelines."""
    st = TextStatser(id_col=id_col, flags_only=True)

    def fn(batch: pa.Table) -> pa.Table:
        flags = st(batch).column("is_quality").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(flags == 1))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def token_frequencies(ds: Dataset, top_k: int = 20) -> Dataset:
    """Global token frequencies, top_k by (count desc, token asc).

    Per-batch partial counts (Arrow value_counts — the combiner) → small
    groupby over distinct tokens → sort + limit. Only (token, partial)
    rows shuffle; at web scale distinct-token cardinality ≪ corpus size.
    """

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat, _ = _tokenize(text)
        if len(flat) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()), "partial": pa.array([], pa.int64())}
            )
        vc = pc.value_counts(flat)
        return pa.table(
            {
                "token": vc.field("values"),
                "partial": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("partial", alias_name="cnt"))
    )
    return agg.sort(["cnt", "token"], descending=[True, False]).limit(top_k)
