"""HTML→text extraction — pinned transformations, corruption-proportional
UTF-8 repair, and the north-rule byte-identical-text-per-url invariant."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from dedup.adapters import pages_from_documents
from dedup.extract import Extractor, apply_rules, decode_utf8_column, extract_text

SF = "/root/testdata/sf0.001"


def _extract_one(html: str) -> str:
    return apply_rules(pa.array([html])).to_pylist()[0]


def test_pinned_cases():
    assert (
        _extract_one("<html><body><p>hello</p><p>world</p></body></html>")
        == "hello\n\nworld"
    )
    assert _extract_one("a<script>var x = 1 < 2;\nalert('hi')</script>b") == "a b"
    assert _extract_one("a<style>p { color: red }</style>b") == "a b"
    assert _extract_one("a<!-- multi\nline\ncomment -->b") == "a b"
    assert _extract_one("x&lt;y&gt; &amp;&nbsp;&quot;q&quot;&#39;a&#39;") == 'x<y> & "q"\'a\''
    assert _extract_one("<span>inline</span> <em>tags</em>") == "inline tags"
    assert _extract_one("  a   b\t c \n\n\n\n d  ") == "a b c\n\nd"
    # SCRIPT case-insensitive, attributes on the tag
    assert _extract_one('<SCRIPT type="x">junk</SCRIPT>ok') == "ok"


def test_decode_repair_proportional():
    rows = [b"plain", b"caf\xc3\xa9", b"bad\xff\xfebytes", b"", b"\x80lead"]
    s, valid = decode_utf8_column(pa.array(rows, pa.binary()))
    assert valid.tolist() == [True, True, False, True, False]
    assert s.to_pylist() == [r.decode("utf-8", "replace") for r in rows]


def test_decode_all_valid_fast_path():
    s, valid = decode_utf8_column(pa.array([b"a", b"caf\xc3\xa9"], pa.binary()))
    assert valid.all() and s.to_pylist() == ["a", "café"]


def test_extractor_binary_and_flags():
    batch = pa.table(
        {
            "url": pa.array(["u1", "u2"]),
            "html": pa.array([b"<p>ok</p>", b"<p>\xffbroken</p>"], pa.binary()),
        }
    )
    out = Extractor()(batch)
    assert out.column_names == ["url", "extracted", "utf8_valid"]
    assert out.column("extracted").to_pylist() == ["ok", "�broken"]
    assert out.column("utf8_valid").to_pylist() == [1, 0]


def test_byte_identical_per_url():
    """North-rule invariant: extracting the pages' html column recovers
    the text column byte-for-byte (adapter pages wrap text in plain
    body markup; corpus text is whitespace-normal)."""
    pages = pages_from_documents(SF).limit(300)
    out = extract_text(pages).to_pandas()
    assert (out["utf8_valid"] == 1).all()
    assert (out["extracted"] == out["text"]).all()


def test_idempotent_normalization():
    """Extracted output is a fixed point of the rule chain (re-running
    extraction on already-clean text changes nothing)."""
    htmls = [
        "<div>a</div><p>b &amp; c</p>",
        "x\n\n\n\ny   z",
        "<ul><li>one</li><li>two</li></ul>",
    ]
    once = apply_rules(pa.array(htmls)).to_pylist()
    twice = apply_rules(pa.array(once)).to_pylist()
    assert once == twice


def test_decode_utf8_large_binary_and_split_sequences():
    """Regression pair: (1) large_binary offsets are int64 — reading
    them as int32 produced garbage slice bounds and a hard worker abort;
    (2) a multibyte sequence SPLIT across row boundaries must mark both
    rows invalid — the old concatenated-buffer scan read it as valid and
    returned invalid bytes inside a utf8 array."""
    import numpy as np
    import pyarrow as pa

    from dedup.extract import decode_utf8_column

    out, valid = decode_utf8_column(
        pa.array([b"hello", b"bad\xffbyte", b"world"], pa.large_binary())
    )
    assert out.type == pa.large_string()
    assert valid.tolist() == [True, False, True]
    assert out.to_pylist() == ["hello", "bad�byte", "world"]

    out2, valid2 = decode_utf8_column(pa.array([b"ab\xc3", b"\xa9cd"], pa.binary()))
    assert valid2.tolist() == [False, False]
    for s in out2.to_pylist():
        s.encode("utf-8")  # round-trips: genuinely valid strings
