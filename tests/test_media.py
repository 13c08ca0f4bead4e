"""Multimodal plumbing tests: schema, actor-pool stage, stubbed codecs."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dedup.media import (
    FEATURE_DIM,
    decode_audio,
    decode_image,
    media_featurize,
    media_features,
    sniff_type,
)


def _pages():
    payloads = [
        b"<html><body>hello</body></html>",
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 64,
        b"\xff\xd8\xff\xe0" + b"\x00" * 32,
        b"RIFF" + b"\x00" * 16,
        b"\x00\x01\x02",
    ]
    return rd.from_arrow(
        pa.table(
            {
                "url": pa.array([f"u{i}" for i in range(len(payloads))]),
                "html": pa.array(payloads, pa.binary()),
            }
        )
    )


def test_sniff_types():
    assert sniff_type(b"<html><body>") == "text/html"
    assert sniff_type(b"\x89PNG\r\n") == "image/png"
    assert sniff_type(b"\xff\xd8\xff\xe0") == "image/jpeg"
    assert sniff_type(b"RIFFxxxx") == "audio/wav"
    assert sniff_type(b"\x00\x01") == "application/octet-stream"


def test_decode_stubs_raise_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF")


def test_decode_fakes_deterministic():
    a = decode_image(b"payload", fake=True)
    b = decode_image(b"payload", fake=True)
    c = decode_image(b"other", fake=True)
    assert a.shape == (8, 8, 3) and (a == b).all() and not (a == c).all()
    s1 = decode_audio(b"x", fake=True)
    assert s1.shape == (256,) and s1.dtype == np.float32


def test_featurize_actor_pool_schema_and_determinism():
    out = media_featurize(_pages(), concurrency=(1, 2), batch_size=2).to_pandas()
    out = out.sort_values("url").reset_index(drop=True)
    assert list(out.columns) == ["url", "media_bytes", "media_type", "media_hash", "feature"]
    assert out["media_type"].tolist() == [
        "text/html", "image/png", "image/jpeg", "audio/wav", "application/octet-stream",
    ]
    assert all(len(f) == FEATURE_DIM for f in out["feature"])
    out2 = media_featurize(_pages(), concurrency=(1, 2), batch_size=3).to_pandas()
    out2 = out2.sort_values("url").reset_index(drop=True)
    assert out["media_hash"].tolist() == out2["media_hash"].tolist()
    assert np.allclose(np.stack(out["feature"]), np.stack(out2["feature"]))


def test_media_features_projection():
    out = media_features(_pages()).to_pandas().sort_values("url")
    assert out["media_bytes"].tolist() == [31, 72, 36, 20, 3]
