"""Deterministic synthetic `pages` fixtures (FIXTURES.md T1/T2/T4).

Mirrors the reference's only corpus (`/root/reference/test/example`: 10 tiny
files forming 3 content-equal groups) plus near-dup / skew / edge cases the
reference cannot express. Seeded; no wall clock; no external data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

BASE_TS = 1_700_000_000_000_000  # microseconds; deterministic epoch base


def _vocab(rng: np.random.Generator, n=4000) -> list[str]:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    out = []
    for _ in range(n):
        ln = int(rng.integers(3, 10))
        out.append("".join(rng.choice(letters, size=ln)))
    return out


def _doc(rng: np.random.Generator, vocab: list[str], n_words: int) -> list[str]:
    idx = rng.integers(0, len(vocab), size=n_words)
    return [vocab[i] for i in idx]


def _edit(rng: np.random.Generator, vocab: list[str], tokens: list[str], rate: float) -> list[str]:
    """Token-level edits (substitute/insert/delete) at ``rate``."""
    out = list(tokens)
    n_edits = max(1, int(len(tokens) * rate))
    for _ in range(n_edits):
        op = rng.integers(0, 3)
        pos = int(rng.integers(0, len(out)))
        w = vocab[int(rng.integers(0, len(vocab)))]
        if op == 0:
            out[pos] = w
        elif op == 1:
            out.insert(pos, w)
        elif len(out) > 10:
            del out[pos]
    return out


@dataclass
class Expected:
    """Golden outputs (order-insensitive; reference group order is
    HashMap-nondeterministic, process_matches.rs:404-406)."""

    exact_groups: list[list[str]] = field(default_factory=list)  # url lists
    near_groups: list[list[str]] = field(default_factory=list)  # incl. base url
    negative_pairs: list[tuple[str, str]] = field(default_factory=list)
    short_hash_split_pairs: list[tuple[str, str]] = field(default_factory=list)
    singleton_urls: list[str] = field(default_factory=list)

    @property
    def near_dup_pairs(self) -> list[tuple[str, str]]:
        pairs = []
        for g in self.near_groups:
            for i in range(len(g)):
                for j in range(i + 1, len(g)):
                    pairs.append((g[i], g[j]))
        return pairs


def make_pages(
    seed: int = 42,
    n_exact_groups: int = 20,
    n_near_groups: int = 30,
    n_singletons: int = 200,
    n_negative_pairs: int = 20,
    n_short_split_pairs: int = 5,
    edit_rate_range: tuple[float, float] = (0.01, 0.03),
) -> tuple[pa.Table, Expected]:
    """Primary fixture (T1). ~2k rows at defaults; scale knobs for bench."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    urls, texts, langs = [], [], []
    exp = Expected()

    def add(url: str, text: str, lang: str = "en"):
        urls.append(url)
        texts.append(text)
        langs.append(lang)

    # exact-dup groups (≅ test/example content groups; urls ≅ hard links)
    for g in range(n_exact_groups):
        k = 2 + g % 3
        text = " ".join(_doc(rng, vocab, int(rng.integers(50, 400))))
        group = [f"https://ex{g}.example.com/p{i}" for i in range(k)]
        for u in group:
            add(u, text)
        exp.exact_groups.append(group)

    # near-dup groups (MinHash/LSH targets)
    for g in range(n_near_groups):
        base = _doc(rng, vocab, int(rng.integers(200, 1200)))
        k = 1 + int(rng.integers(1, 4))  # base + 1..3 variants
        group = [f"https://near{g}.example.com/v0"]
        add(group[0], " ".join(base))
        for v in range(1, k):
            rate = float(rng.uniform(*edit_rate_range))
            var = _edit(rng, vocab, base, rate)
            u = f"https://near{g}.example.com/v{v}"
            add(u, " ".join(var))
            group.append(u)
        if len(group) > 1:
            exp.near_groups.append(group)

    # negative controls: moderate overlap, Jaccard(5-gram) ~ 0 .. <=0.3
    for g in range(n_negative_pairs):
        base = _doc(rng, vocab, 400)
        other = list(base)
        # replace 60% of tokens -> 5-gram survival ~0.4^5, J ~ 0.01
        repl = rng.choice(len(other), size=int(0.6 * len(other)), replace=False)
        for p in repl:
            other[p] = vocab[int(rng.integers(0, len(vocab)))]
        u1, u2 = f"https://neg{g}.example.com/a", f"https://neg{g}.example.com/b"
        add(u1, " ".join(base))
        add(u2, " ".join(other))
        exp.negative_pairs.append((u1, u2))

    # same-size, same-first-4096-bytes, different tail (stage-2 vs stage-3)
    for g in range(n_short_split_pairs):
        prefix = " ".join(_doc(rng, vocab, 900))[:4200]
        tail_a = "A" * 64
        tail_b = "B" * 64
        u1, u2 = f"https://split{g}.example.com/a", f"https://split{g}.example.com/b"
        add(u1, prefix + tail_a)
        add(u2, prefix + tail_b)
        exp.short_hash_split_pairs.append((u1, u2))

    # singletons
    for s in range(n_singletons):
        u = f"https://single{s}.example.com/"
        add(u, " ".join(_doc(rng, vocab, int(rng.integers(30, 500)))))
        exp.singleton_urls.append(u)

    # edge rows: empty, whitespace, newline-in-url, non-en
    add("https://edge.example.com/empty", "")
    add("https://edge.example.com/ws", "   \n\t  ")
    add("https://edge.example.com/new\nline", "newline url text")
    add("https://edge.example.com/de", "der die das " * 40, lang="de")
    exp.singleton_urls += [
        "https://edge.example.com/empty",
        "https://edge.example.com/ws",
        "https://edge.example.com/new\nline",
        "https://edge.example.com/de",
    ]

    n = len(urls)
    ts = pa.array(np.arange(n, dtype=np.int64) * 1_000_000 + BASE_TS, type=pa.timestamp("us"))
    html = [
        b"<html><body>" + t.encode() + b"</body></html>" if i % 17 else b"<html>\xff\xfe" + t.encode()
        for i, t in enumerate(texts)
    ]  # some non-UTF-8 html rows
    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": ts,
            "html": pa.array(html, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    return table, exp


def cascade_equiv_table() -> tuple[pa.Table, list[list[str]]]:
    """T2 — transliteration of the reference corpus test/example:
    3 content-equal groups over 10 urls. Expected clusters at min_size=1."""
    rows = [
        ("a/a", "first\n"),
        ("a/b", "first\n"),
        ("b", "next\n"),
        ("c", "first\n"),
        ("d", "next\n"),
        ("f", "next\n"),
        ("g", "next\n"),
        ("h", "third\n"),
        ("i", "third\n"),
        ("j", "third\n"),
    ]
    urls = [r[0] for r in rows]
    texts = [r[1] for r in rows]
    n = len(rows)
    table = pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": pa.array([BASE_TS + i for i in range(n)], pa.timestamp("us")),
            "html": pa.array([t.encode() for t in texts], pa.binary()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
        }
    )
    expected = [["a/a", "a/b", "c"], ["b", "d", "f", "g"], ["h", "i", "j"]]
    return table, expected


def skew_table(seed: int = 7, n: int = 20_000, hot_frac: float = 0.3) -> pa.Table:
    """T4 — hot-band stress: ``hot_frac`` of rows share one boilerplate
    template (one LSH bucket goes quadratic without salting)."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    boiler = _doc(rng, vocab, 300)
    urls, texts = [], []
    n_hot = int(n * hot_frac)
    for i in range(n_hot):
        t = list(boiler)
        # tiny per-page tweak so they're near-dups, not exact dups
        t[int(rng.integers(0, len(t)))] = vocab[int(rng.integers(0, len(vocab)))]
        urls.append(f"https://hot.example.com/{i}")
        texts.append(" ".join(t))
    for i in range(n - n_hot):
        urls.append(f"https://cold{i}.example.com/")
        texts.append(" ".join(_doc(rng, vocab, int(rng.integers(50, 400)))))
    m = len(urls)
    return pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": pa.array([BASE_TS + i for i in range(m)], pa.timestamp("us")),
            "html": pa.array([t.encode() for t in texts], pa.binary()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * m),
        }
    )
