"""Multimodal plumbing tests: schema, actor-pool stage, real pure-numpy
PNG/WAV codecs (round-trip pinned)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dedup.media import (
    FEATURE_DIM,
    decode_audio,
    decode_image,
    encode_png,
    encode_wav,
    media_featurize,
    media_features,
    sniff_type,
)


def _payloads():
    rng = np.random.default_rng(5)
    return [
        b"<html><body>hello</body></html>",
        encode_png(rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)),
        b"\xff\xd8\xff\xe0" + b"\x00" * 32,
        encode_wav(rng.standard_normal(64).astype(np.float32) * 0.1),
        b"\x00\x01\x02",
    ]


def _pages():
    payloads = _payloads()
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


def test_png_roundtrip_all_color_types():
    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(13, 9, c), dtype=np.uint8)
        out = decode_image(encode_png(px))
        assert out.shape == (13, 9, c)
        assert (out == px).all()


def test_png_all_filter_types_decode():
    # hand-build a 4-row RGB PNG using one scanline filter per row
    # (encode_png only emits filter 0) and check against a reference
    # unfilter done straight from the spec
    import struct
    import zlib

    rng = np.random.default_rng(3)
    h, w, c = 4, 6, 3
    px = rng.integers(0, 256, size=(h, w * c), dtype=np.uint8).astype(np.int32)
    filters = [1, 2, 3, 4]
    raw = bytearray()
    prev = np.zeros(w * c, np.int32)
    for y, f in enumerate(filters):
        cur = px[y]
        line = np.empty(w * c, np.int32)
        for x in range(w * c):
            left = cur[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            if f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa_, pb_, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa_ <= pb_ and pa_ <= pc_ else (up if pb_ <= pc_ else ul)
            line[x] = (cur[x] - pred) & 0xFF
        raw.append(f)
        raw.extend(line.astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
    out = decode_image(payload)
    assert (out.reshape(h, w * c) == px.astype(np.uint8)).all()


def test_wav_roundtrip():
    rng = np.random.default_rng(11)
    x = np.clip(rng.standard_normal((480, 2)) * 0.3, -0.99, 0.99).astype(np.float32)
    samples, rate = decode_audio(encode_wav(x, sample_rate=8000))
    assert rate == 8000 and samples.shape == (480, 2)
    # encode scales by 32767, decode by 32768 (the PCM16 convention) →
    # worst-case round-trip error (0.5 + |x|) / 32768
    assert np.abs(samples - x).max() <= (0.5 + np.abs(x).max()) / 32768


def test_decode_unsupported_formats_raise():
    # MP3 needs a codec lib not in this container
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04mp3...")
    # truncated/garbage JPEG and GIF are malformed-stream errors, not
    # unsupported formats (both are decodable now)
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0jpeg...")
    with pytest.raises(ValueError):
        decode_image(b"GIF89a\x01\x00gif...")


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
    assert out["media_bytes"].tolist() == [len(p) for p in _payloads()]


def test_sniffed_payloads_decode():
    # the typed-metadata sniff and the decoders agree: every payload
    # sniffed image/png or audio/wav actually decodes
    for p in _payloads():
        t = sniff_type(p)
        if t == "image/png":
            assert decode_image(p).shape == (8, 8, 3)
        elif t == "audio/wav":
            samples, rate = decode_audio(p)
            assert rate == 16000 and samples.shape == (64, 1)


def test_synth_media_payload_decodes_to_formulas():
    from dedup.media import synth_media_payload

    # 2, 10, 18 are GIF-container images (2 and 18 interlaced, 10 plain)
    for i in (0, 1, 2, 3, 7, 10, 12, 18, 33, 64, 101):
        p = synth_media_payload(i)
        if i % 2 == 0:
            px = decode_image(p)
            h, w, c = 8 + i % 9, 8 + i % 7, 1 if i % 4 == 0 else 3
            assert px.shape == (h, w, c)
            y, x, ch = np.ogrid[0:h, 0:w, 0:c]
            assert (px == ((i * 7 + y * 5 + x * 3 + ch) % 256)).all()
        else:
            x, rate = decode_audio(p)
            frames, channels = 32 + i % 33, 1 + (i // 2) % 2
            assert x.shape == (frames, channels)
            assert rate == 8000 * (1 + i % 3)
            n = frames * channels
            v = ((i * 31 + np.arange(n) * 17) % 65536) - 32768
            assert (np.round(x.reshape(-1) * 32768.0).astype(np.int64) == v).all()


def test_media_decode_stage():
    from dedup.media import media_decode, synth_media

    ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(20), pa.int64())}))
    out = media_decode(synth_media(ds)).to_pandas().sort_values("doc_id")
    assert len(out) == 20
    assert (out["kind"] == ["image", "audio"] * 10).all()
    img = out[out["kind"] == "image"]
    assert (img["height"] == 8 + img["doc_id"] % 9).all()
    assert (img["frames"] == 0).all()
    aud = out[out["kind"] == "audio"]
    assert (aud["sample_rate"] == 8000 * (1 + aud["doc_id"] % 3)).all()
    assert (aud["height"] == 0).all()


# ----------------------------------------------------------- baseline JPEG
def test_jpeg_exact_roundtrip_block_constant_gray():
    """quant=1 + 8x8-block-constant input → DC-only blocks → bit-exact
    decode (the IDCT of a lone DC coefficient is a constant block)."""
    from dedup.media import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(0)
    blocks = rng.integers(0, 256, size=(3, 4), dtype=np.int64)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=1))
    assert out.shape == (24, 32, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_jpeg_rgb_roundtrip_close_and_odd_dims():
    from dedup.media import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(1)
    img = (rng.integers(0, 256, size=(19, 23, 3)).astype(np.float64) * 0.2 + 100).astype(
        np.uint8
    )
    out = decode_jpeg(encode_jpeg(img, quant=1))
    assert out.shape == (19, 23, 3)
    # color transform + quant=1 keeps error within a couple of levels
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_jpeg_dispatch_and_sniff():
    from dedup.media import decode_image, encode_jpeg, sniff_type

    img = np.full((8, 8), 42, np.uint8)
    payload = encode_jpeg(img)
    assert sniff_type(payload) == "image/jpeg"
    out = decode_image(payload)  # dispatches on magic
    assert np.array_equal(out[:, :, 0], img)


def test_jpeg_progressive_rejected():
    import pytest as _pytest

    from dedup.media import decode_jpeg, encode_jpeg

    payload = bytearray(encode_jpeg(np.full((8, 8), 9, np.uint8)))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2  # flip SOF0 → SOF2 (progressive)
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))


def test_jpeg_noninterleaved_multiscan_rejected():
    """A scan covering fewer components than the frame (non-interleaved
    baseline, one scan per component) uses component-local MCU geometry;
    decoding it with the interleaved walk silently yields garbage, so it
    must raise instead (fail-loud policy)."""
    import pytest as _pytest

    from dedup.media import decode_jpeg, encode_jpeg

    rgb = np.full((8, 8, 3), 40, np.uint8)
    payload = bytearray(encode_jpeg(rgb))
    i = payload.find(b"\xff\xda")
    assert payload[i + 4] == 3  # Ns for the interleaved 3-component scan
    payload[i + 4] = 1  # pretend scan 1/3 (non-interleaved layout)
    with _pytest.raises(NotImplementedError, match="1/3"):
        decode_jpeg(bytes(payload))


def test_jpeg_quant_tables_honored():
    """A coarser quant table changes coefficients but decode still lands
    near the source (sanity that DQT is actually applied, not ignored)."""
    from dedup.media import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(2)
    img = (rng.standard_normal((16, 16)) * 10 + 128).clip(0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=4))
    assert out.shape == (16, 16, 1)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).mean() < 6


# ----------------------------------------------------------------- GIF
def test_gif_roundtrip_random_palette():
    from dedup.media import decode_gif, encode_gif

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, size=(200, 3), dtype=np.uint8)
    idx = rng.integers(0, 200, size=(23, 17))
    px = pal[idx]
    for interlace in (False, True):
        out = decode_gif(encode_gif(px, interlace=interlace))
        assert out.shape == (23, 17, 3)
        assert (out == px).all()


def test_gif_roundtrip_solid_and_two_color():
    from dedup.media import decode_gif, encode_gif

    solid = np.full((9, 5, 3), 42, np.uint8)
    assert (decode_gif(encode_gif(solid)) == solid).all()
    two = np.zeros((8, 8, 3), np.uint8)
    two[::2, ::2] = 255
    assert (decode_gif(encode_gif(two)) == two).all()


def test_gif_lzw_dict_overflow_roundtrip():
    # 256 colors × noisy 150×150 forces the LZW dict past 4096 codes →
    # exercises the encoder's clear/reset and the decoder's width growth
    from dedup.media import decode_gif, encode_gif

    rng = np.random.default_rng(3)
    v = rng.integers(0, 256, size=(150, 150), dtype=np.uint8)
    px = np.stack([v, (v + 1) % 256, (v + 3) % 256], axis=2)
    out = decode_gif(encode_gif(px))
    assert (out == px).all()


def test_gif_dispatch_and_sniff():
    from dedup.media import encode_gif

    px = np.zeros((4, 4, 3), np.uint8)
    payload = encode_gif(px)
    assert sniff_type(payload) == "image/gif"
    assert (decode_image(payload) == px).all()
    # >256 distinct colors must fail loud (GIF is palette-based)
    v = np.arange(300, dtype=np.int64)
    many = np.stack([v % 256, (v // 256) * 7, np.zeros(300, np.int64)], axis=1)
    with pytest.raises(ValueError):
        encode_gif(many.astype(np.uint8).reshape(30, 10, 3))


def test_gif_positioned_partial_frame_refused():
    """A first frame smaller than the logical screen (or offset) must
    raise rather than silently decode frame-local pixels as the canvas."""
    import struct

    from dedup.media import decode_gif, encode_gif

    full = encode_gif(np.zeros((4, 4, 3), np.uint8))
    # rewrite the image descriptor: 2x2 frame at offset (1, 1)
    i = full.index(b"\x2c")
    hacked = (
        full[:i]
        + b"\x2c"
        + struct.pack("<HHHH", 1, 1, 2, 2)
        + full[i + 9 :]
    )
    with pytest.raises(NotImplementedError, match="positioned/partial"):
        decode_gif(hacked)
