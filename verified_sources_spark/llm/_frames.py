"""Exact Arrow-batch frame construction for mapInPandas emitters.

The trap: ``pd.DataFrame(list_of_dicts)`` infers a MIXED int+None
column as float64, silently truncating 64-bit values to the 53-bit
mantissa.  For perceptual-hash columns this is data corruption that
equality tests DON'T catch when both sides of a join corrupt
identically — it only surfaces when one operator's batch contains a
refusal row (None) and the other's doesn't, making the same asset hash
differently in different pipelines.  Every emitter of a long-typed
hash/fingerprint column must build that column as pandas nullable
Int64 (``pd.array(..., dtype="Int64")``), which preserves all 64 bits
and round-trips through Arrow as int64 + validity bitmap.
"""

from __future__ import annotations

__all__ = ["exact_frame"]


def exact_frame(rows: list[dict], columns: list[str],
                int64_cols: tuple[str, ...] = ()):
    """``pd.DataFrame(rows, columns=columns)`` but with the named
    columns built as nullable Int64 so None never demotes 64-bit ints
    to float64."""
    import pandas as pd

    data = {}
    for c in columns:
        vals = [r.get(c) for r in rows]
        if c in int64_cols:
            data[c] = pd.array(vals, dtype="Int64")
        else:
            data[c] = vals
    if not rows:
        return pd.DataFrame({c: [] for c in columns}, columns=columns)
    return pd.DataFrame(data, columns=columns)
