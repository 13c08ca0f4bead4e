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
