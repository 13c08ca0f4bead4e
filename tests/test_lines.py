"""Line-level (boilerplate) dedup — CCNet/Gopher-style cleaning."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from dedup.lines import boilerplate_line_hashes, line_dedup


def _docs(texts):
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    )


def test_line_dedup_removes_shared_lines_keeps_order():
    banner = "ACCEPT COOKIES"
    footer = "copyright 2026"
    texts = [
        f"{banner}\nunique alpha\nmiddle one\n{footer}",
        f"{banner}\nunique beta\n{footer}",
        "totally distinct document",
        f"solo doc\n{banner}",
    ]
    out = (
        line_dedup(_docs(texts), min_docs=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["text"].tolist() == [
        "unique alpha\nmiddle one",
        "unique beta",
        "totally distinct document",
        "solo doc",
    ]


def test_line_dedup_min_docs_threshold_and_empty_lines():
    texts = ["a\n\nb", "c\n\nd", "only one\nhere"]
    # empty line occurs in 2 docs → dropped at min_docs=2, kept at 3
    out2 = line_dedup(_docs(texts), min_docs=2).to_pandas().sort_values("doc_id")
    assert out2["text"].tolist() == ["a\nb", "c\nd", "only one\nhere"]
    out3 = line_dedup(_docs(texts), min_docs=3).to_pandas().sort_values("doc_id")
    assert out3["text"].tolist() == texts


def test_line_dedup_fully_boilerplate_doc_goes_empty():
    texts = ["same\nlines", "same\nlines", "other"]
    out = line_dedup(_docs(texts), min_docs=2).to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == ["", "", "other"]
    drops = boilerplate_line_hashes(_docs(texts), min_docs=2)
    assert len(drops) == 2  # "same", "lines"


def test_line_count_is_per_distinct_doc_not_occurrence():
    # "rep" appears 3x within ONE doc — must not count as 3 docs
    texts = ["rep\nrep\nrep", "unique stuff"]
    out = line_dedup(_docs(texts), min_docs=2).to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == texts


def test_line_dedup_join_branch_identical_int_ids():
    # cap=0 forces the explode→join→reassemble path; output must match
    # the broadcast branch exactly, including the fully-boilerplate doc
    banner = "ACCEPT COOKIES"
    texts = [
        f"{banner}\nunique alpha\nmiddle one",
        f"{banner}\nunique beta",
        "totally distinct document",
        f"{banner}",  # fully boilerplate → empty text, row kept
        "a\n\nb",
        "c\n\nd",
    ]
    a = (
        line_dedup(_docs(texts), min_docs=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        line_dedup(_docs(texts), min_docs=2, max_broadcast_rows=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a["text"].tolist() == b["text"].tolist()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert b.loc[3, "text"] == ""


def test_line_dedup_join_branch_identical_string_ids():
    texts = ["x\nshared", "y\nshared", "z alone"]
    ds = rd.from_arrow(
        pa.table({"url": pa.array([f"u{i}" for i in range(3)]),
                  "text": pa.array(texts)})
    )
    a = (
        line_dedup(ds, min_docs=2, id_col="url")
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    b = (
        line_dedup(ds, min_docs=2, id_col="url", max_broadcast_rows=0)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert a["text"].tolist() == b["text"].tolist() == ["x", "y", "z alone"]
    assert a["url"].tolist() == b["url"].tolist()
