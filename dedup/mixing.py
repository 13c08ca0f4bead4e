"""Deterministic per-source corpus sampling (data-mixture weighting).

Training corpora are blended from sources at tuned rates ("webtext ×
0.8, wiki × 2 epochs, …"). This operator downsamples each source at a
configured rate with a DETERMINISTIC coin: keep a row iff

    (id * 2654435761) mod 2^32  <  floor(rate * 2^32)

— Knuth's multiplicative hash, reproducible run-to-run, shard-order
independent, and computable in plain SQL (so the oracle regenerates the
exact sample, unlike PRNG-based sampling). No reference analogue; the
per-batch shape mirrors the ingest gates.

Scale: a stateless vectorized filter per batch — no shuffle, no driver
state; rate lookup is a dictionary-encode + numpy take.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

KNUTH = np.uint64(2654435761)
_MOD = np.uint64(1) << np.uint64(32)


def thresholds_from_rates(rates: dict[str, float]) -> dict[str, int]:
    """rate ∈ [0,1] → integer threshold. Computed ONCE here so the Ray
    filter and any SQL mirror compare against identical integers."""
    out = {}
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1]")
        out[k] = int(r * (1 << 32))
    return out


def mix_sources(
    docs: Dataset,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> Dataset:
    """Keep each row with its source's deterministic rate (see module doc).

    ``rates`` maps source name → keep rate in [0, 1]; unlisted sources
    use ``default_rate``. Rows with rate 1.0 always survive; rate 0.0
    drops the source entirely.
    """
    thr = thresholds_from_rates(rates)
    dthr = thresholds_from_rates({"_": default_rate})["_"]

    def fl(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).view(np.uint64)
        coin = (ids * KNUTH) % _MOD
        src = batch.column(source_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        cut = np.array(
            [thr.get(s, dthr) for s in enc.dictionary.to_pylist()], np.uint64
        )
        idx = enc.indices.to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(coin < cut[idx]))

    return docs.map_batches(fl, batch_format="pyarrow", zero_copy_batch=True)
