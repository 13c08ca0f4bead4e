"""PII redaction: typed masking, counts, ordering, null handling."""

import pyarrow as pa
import pytest
import ray.data as rd

from dedup.redact import PII_PATTERNS, Redactor, redact_pii


def _run(texts):
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    return redact_pii(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_masks_and_counts():
    df = _run([
        "mail bob.smith+tag@ex-ample.co.uk and eve@x.io",
        "hosts 8.8.8.8 192.168.1.254",
        "dial +44 20 7946 0958 thanks",
        "clean text with number 42",
        None,
    ])
    assert df["n_email"].tolist() == [2, 0, 0, 0, 0]
    assert df["n_ipv4"].tolist() == [0, 2, 0, 0, 0]
    assert df["n_phone"].tolist() == [0, 0, 1, 0, 0]
    assert df["text_redacted"][0] == "mail <EMAIL> and <EMAIL>"
    assert df["text_redacted"][1] == "hosts <IP> <IP>"
    assert df["text_redacted"][2] == "dial <PHONE> thanks"
    assert df["text_redacted"][3] == "clean text with number 42"
    assert df["text_redacted"][4] == ""  # null-safe


def test_order_prevents_double_counting():
    """An IP must be consumed by the ipv4 pattern, not survive into the
    phoneish digit-run pattern; an email's digits never count as phone."""
    df = _run(["ip 10.20.30.40 then digits 123-456-7890",
               "a1234567890@b.com"])
    assert df.loc[0, "n_ipv4"] == 1 and df.loc[0, "n_phone"] == 1
    assert df.loc[1, "n_email"] == 1
    assert df.loc[1, "n_phone"] == 0
    assert df.loc[1, "text_redacted"] == "<EMAIL>"


def test_matches_python_re_reference():
    import re

    texts = [
        "a@b.io c@d.org 1.2.3.4 +1 555 000 1111",
        "nested user@[not] 300.300.300.300 9-9-9",
        "tel: 0012345678901234 end",
    ]
    got = _run(texts)
    for i, t in enumerate(texts):
        cur = t
        for name, pat, repl in PII_PATTERNS:
            assert got.loc[i, f"n_{name}"] == len(re.findall(pat, cur))
            cur = re.sub(pat, repl, cur)
        assert got.loc[i, "text_redacted"] == cur


def test_bad_pattern_fails_fast():
    with pytest.raises(pa.lib.ArrowException):
        Redactor(patterns=(("bad", r"(?<=x)y", "<Z>"),))  # lookbehind ∉ RE2


def test_uppercase_email_redacted():
    """Redaction runs on RAW text; 'John.Doe@Example.com' must not
    survive (the lowercase-only class leaked it)."""
    import pyarrow as pa
    import ray.data as rd

    from dedup.redact import redact_pii

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["mail John.Doe@Example.COM today"])})
    )
    out = redact_pii(ds).to_pandas()
    assert int(out["n_email"][0]) == 1
    assert "<EMAIL>" in out["text_redacted"][0]
    assert "Example" not in out["text_redacted"][0]
