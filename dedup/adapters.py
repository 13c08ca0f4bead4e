"""Adapters from the driver's testdata tables to the `pages` input schema.

The north-rule input (BASELINE.json input_hint) is a Common-Crawl-style
table ``(url, warc_ts, html, text, lang)``. The driver's ``documents``
table ``(doc_id, text, lang, source, n_chars)`` carries the text corpus;
this module deterministically re-shapes it into pages and **plants exact
duplicates** (the corpus itself has none) so the dedup cascade has real
work. The planting rule is pure modular arithmetic on ``doc_id`` so the
DuckDB oracle SQL reproduces the exact same pages table with UNION ALL —
see ``dedup/queries.py:PAGES_SQL``.

Planting rule (≅ hard links in the reference: several urls → one content
identity, /root/reference/src/types.rs:256-267):
  - every document: url  = 'doc://<source>/<doc_id>'
  - doc_id % 10 == 0: extra copy at url + '#dup1'
  - doc_id % 20 == 0: second extra copy at url + '#dup2'
so doc_id % 20 == 0 → cluster of 3 urls, else doc_id % 10 == 0 → cluster
of 2; all other urls are singletons.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

BASE_TS = 1_700_000_000_000_000  # µs; matches synth.BASE_TS

_HTML_PRE = b"<html><body>"
_HTML_POST = b"</body></html>"


def _to_pages(batch: pa.Table, plant_dups: bool) -> pa.Table:
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    url = pc.binary_join_element_wise(
        pa.array(["doc://"] * len(batch)),
        batch.column("source"),
        pa.array(["/"] * len(batch)),
        pc.cast(batch.column("doc_id"), pa.string()),
        "",
    )
    text = batch.column("text")
    html = pc.binary_join_element_wise(
        pa.array([_HTML_PRE] * len(batch), pa.binary()),
        pc.cast(text, pa.binary()),
        pa.array([_HTML_POST] * len(batch), pa.binary()),
        b"",
    )
    ts = pa.array(doc_id * 1_000_000 + BASE_TS, pa.timestamp("us"))
    base = pa.table(
        {
            "url": url,
            "warc_ts": ts,
            "html": html,
            "text": text,
            "lang": batch.column("lang"),
        }
    )
    if not plant_dups:
        return base
    parts = [base]
    for suffix, mod in (("#dup1", 10), ("#dup2", 20)):
        mask = pa.array(doc_id % mod == 0)
        sub = base.filter(mask)
        if len(sub):
            dup_url = pc.binary_join_element_wise(
                sub.column("url"), pa.array([suffix] * len(sub)), ""
            )
            parts.append(sub.set_column(0, "url", dup_url))
    return pa.concat_tables(parts)


def pages_from_documents(sf_dir: str, plant_dups: bool = True) -> Dataset:
    """documents.parquet → pages Dataset (url, warc_ts, html, text, lang)."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    return docs.map_batches(
        lambda b: _to_pages(b, plant_dups), batch_format="pyarrow", zero_copy_batch=True
    )


def expanded_pages(
    sf_dir: str,
    factor: int,
    seed: int = 42,
    dup_frac_mod: int = 4,
    concat: int = 3,
) -> Dataset:
    """Bench-scale pages with a web-realistic duplicate profile.

    Each base document becomes ``factor`` pages of ~``concat``× the base
    length (neighbouring base texts concatenated — Common-Crawl pages are
    KBs, not 300 B). Bases with ``doc_id % dup_frac_mod == 0`` (25% at
    the default) expand into a planted near-dup cluster (half verbatim,
    half ~2% token edits); all other bases expand into *unique* pages
    (50% token replacement per copy — 5-gram Jaccard ≈ 0.03, below any
    clustering threshold). Edit POSITIONS are seeded by (doc_id, copy);
    the appended filler text concatenates batch-relative neighbour
    rows, so page BODIES also depend on the reader's block/batch
    layout — deterministic for a fixed parquet file and reader
    config (this sandbox), but not across layout changes. Bench
    corpora are therefore pre-written once and reused across legs
    (BENCH_CORPUS_DIR) rather than re-expanded per process.
    """

    def expand(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        srcs = batch.column("source").to_pylist()
        urls, out_t, out_l, out_ts = [], [], [], []
        for i in range(len(batch)):
            base_txt = " ".join(texts[(i + k) % len(texts)] for k in range(concat))
            toks = base_txt.split(" ")
            is_dup_cluster = int(doc_id[i]) % dup_frac_mod == 0
            for j in range(factor):
                rng = np.random.default_rng(seed * 1_000_003 + int(doc_id[i]) * 1024 + j)
                if is_dup_cluster and j % 2 == 0:
                    t = base_txt  # verbatim → exact-dup work
                else:
                    tt = list(toks)
                    n_edit = (
                        max(1, len(tt) // 50) if is_dup_cluster else max(1, len(tt) // 2)
                    )
                    for p in rng.integers(0, max(len(tt), 1), size=n_edit):
                        tt[int(p)] = f"tok{int(rng.integers(0, 9_999_999))}"
                    t = " ".join(tt)
                urls.append(f"doc://{srcs[i]}/{int(doc_id[i])}/c{j}")
                out_t.append(t)
                out_l.append(langs[i])
                out_ts.append(BASE_TS + int(doc_id[i]) * 1_000_000 + j)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(out_ts, pa.timestamp("us")),
                "html": pa.array(
                    [_HTML_PRE + t.encode() + _HTML_POST for t in out_t], pa.binary()
                ),
                "text": pa.array(out_t, pa.string()),
                "lang": pa.array(out_l, pa.string()),
            }
        )

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
        override_num_blocks=64,  # parallelize the (row-loop) generation
    )
    return docs.map_batches(expand, batch_format="pyarrow", batch_size=128)
