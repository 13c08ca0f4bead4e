"""XXH64 kernel: pinned public vectors + vectorized-vs-pure parity."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dedup.hashing import fmix64, utf8_lengths, xxh64, xxh64_arrow, xxh64_bytes_many


def test_published_vectors():
    # XXH64 of empty input, seed 0 — published in the xxHash spec.
    assert xxh64(b"") == 0xEF46DB3751D8E999


def _many(items: list[bytes], seed=0, prefix=None) -> list[int]:
    arr = pa.array(items, type=pa.binary())
    return [int(h) for h in xxh64_arrow(arr, seed=seed, prefix=prefix)]


def test_vectorized_matches_pure_small():
    items = [
        b"",
        b"a",
        b"abc",
        b"0123456789abcdef",  # 16 B
        b"0123456789abcdefghijklmnopqrstu",  # 31 B
        b"0123456789abcdefghijklmnopqrstuv",  # 32 B
        b"0123456789abcdefghijklmnopqrstuvw",  # 33 B
        bytes(range(256)),
        b"x" * 4095,
        b"x" * 4096,
        b"x" * 4097,
    ]
    assert _many(items) == [xxh64(b) for b in items]
    assert _many(items, seed=12345) == [xxh64(b, seed=12345) for b in items]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=50),
    st.integers(min_value=0, max_value=2**32),
)
def test_vectorized_matches_pure_property(items, seed):
    assert _many(items, seed=seed) == [xxh64(b, seed=seed) for b in items]


def test_prefix_hash():
    items = [b"hello world, this is a long-ish string", b"hi"]
    got = _many(items, prefix=5)
    assert got == [xxh64(b[:5]) for b in items]


def test_string_array_and_nulls():
    arr = pa.array(["abc", None, "", "déjà vu"])
    got = xxh64_arrow(arr)
    assert int(got[0]) == xxh64(b"abc")
    assert int(got[1]) == xxh64(b"")  # null -> empty
    assert int(got[2]) == xxh64(b"")
    assert int(got[3]) == xxh64("déjà vu".encode())


def test_sliced_and_chunked_arrays():
    base = pa.array([f"s{i}" * (i % 7) for i in range(100)])
    sl = base.slice(13, 40)
    got = xxh64_arrow(sl)
    assert [int(h) for h in got] == [xxh64(s.as_py().encode()) for s in sl]
    ch = pa.chunked_array([base.slice(0, 30), base.slice(30, 70)])
    got2 = xxh64_arrow(ch)
    assert [int(h) for h in got2] == [xxh64(s.as_py().encode()) for s in base]


def test_utf8_lengths():
    arr = pa.array(["", "a", "déjà", None])
    assert utf8_lengths(arr).tolist() == [0, 1, len("déjà".encode()), 0]


def test_length_bucketing_survives_outlier():
    # one huge row amid tiny rows must not break chunked padding
    items = [b"t" * 3] * 20 + [b"B" * 300_000] + [b"q" * 17] * 20
    assert _many(items) == [xxh64(b) for b in items]


def test_fmix64_bijective_sample():
    x = np.arange(10_000, dtype=np.uint64)
    y = fmix64(x)
    assert len(np.unique(y)) == len(x)
    # deterministic
    assert np.array_equal(fmix64(x), y)


def test_empty_input():
    assert xxh64_bytes_many(np.empty(0, np.uint8), np.empty(0, np.int64), np.empty(0, np.int64)).shape == (0,)


def test_small_string_fast_path_boundary():
    # all-lengths<32 batches take the dedicated fast path; pin every
    # length 0..31 against the pure-Python reference, plus 32/33 in the
    # same call to force the general path for comparison
    small = [bytes(range(n)) for n in range(32)]
    assert xxh64_arrow(
        __import__("pyarrow").array(small, __import__("pyarrow").binary())
    ).tolist() == [xxh64(s) for s in small]
    mixed = small + [bytes(range(32)), bytes(33)]
    got = xxh64_arrow(
        __import__("pyarrow").array(mixed, __import__("pyarrow").binary()), seed=7
    ).tolist()
    assert got == [xxh64(s, seed=7) for s in mixed]
