"""MQ arithmetic coder (llm/mq_coder): randomized round-trip battery,
the spec's structural invariants, and compression sanity.  No external
MQ implementation or conformance stream exists in this environment;
this battery plus the JBIG2 bitmap-level cross-check in test_jbig2.py
is the verification posture (documented in the module docstring)."""

from __future__ import annotations

import math
import random

import pytest

from verified_sources_spark.llm.mq_coder import MQDecoder, MQEncoder


def _round_trip(bits, n_ctx):
    enc = MQEncoder(n_ctx)
    for cx, d in bits:
        enc.encode(cx, d)
    data = enc.flush()
    dec = MQDecoder(data, n_ctx)
    return data, [dec.decode(cx) for cx, _ in bits]


@pytest.mark.parametrize("seed", range(8))
def test_randomized_round_trip(seed):
    rng = random.Random(seed)
    for _ in range(12):
        n_ctx = rng.choice([1, 2, 16, 512, 1 << 16])
        n = rng.choice([1, 7, 100, 3000])
        skew = rng.choice([0.01, 0.1, 0.5, 0.9, 0.99])
        bits = [(rng.randrange(n_ctx), 1 if rng.random() < skew else 0)
                for _ in range(n)]
        data, got = _round_trip(bits, n_ctx)
        assert got == [d for _, d in bits], (seed, n_ctx, n, skew)


def test_bit_stuffing_invariant():
    """T.88/T.800: the byte after an 0xFF carries only 7 bits — it is
    never above 0x8F in encoder output (that range is reserved for
    markers)."""
    rng = random.Random(99)
    for trial in range(20):
        bits = [(0, rng.randrange(2)) for _ in range(5000)]
        data, got = _round_trip(bits, 1)
        assert got == [d for _, d in bits]
        for i in range(len(data) - 1):
            if data[i] == 0xFF:
                assert data[i + 1] <= 0x8F, (trial, i)


def test_decode_reads_past_end_as_ones():
    """The marker rule: BYTEIN past the end of data feeds 1-bits, so
    dropping the optional 0xFF terminator (which flush does) loses
    nothing."""
    bits = [(0, d) for d in (1, 0, 1, 1, 0, 0, 1, 0) * 40]
    enc = MQEncoder(1)
    for cx, d in bits:
        enc.encode(cx, d)
    data = enc.flush()
    dec = MQDecoder(data + b"\xff", 1)  # explicit terminator: same
    assert [dec.decode(0) for _ in bits] == [d for _, d in bits]


def test_adaptive_compression_near_entropy():
    """A 2%-skewed binary source must code near its entropy — a wrong
    Qe table row or broken state walk shows up here long before it
    breaks a round trip."""
    rng = random.Random(5)
    bits = [1 if rng.random() < 0.02 else 0 for _ in range(100_000)]
    enc = MQEncoder(1)
    for d in bits:
        enc.encode(0, d)
    data = enc.flush()
    p = sum(bits) / len(bits)
    entropy_bytes = -(p * math.log2(p) + (1 - p) * math.log2(1 - p)) \
        * len(bits) / 8
    assert len(data) < entropy_bytes * 1.10, (len(data), entropy_bytes)


def test_degenerate_streams():
    # all-MPS and all-LPS runs, single bit, empty
    for pattern in ([0] * 4000, [1] * 4000, [1], [0]):
        bits = [(0, d) for d in pattern]
        _, got = _round_trip(bits, 1)
        assert got == pattern
    enc = MQEncoder(4)
    assert isinstance(enc.flush(), bytes)  # empty flush never raises


def test_context_independence():
    """Interleaved contexts adapt independently: a context fed pure
    1s stays cheap even while a sibling context carries noise."""
    rng = random.Random(11)
    bits = []
    for _ in range(20_000):
        bits.append((0, 1))                    # pure
        bits.append((1, rng.randrange(2)))     # noise
    data, got = _round_trip(bits, 2)
    assert got == [d for _, d in bits]
    # noise alone would need ~2500 bytes; the pure context must add
    # almost nothing on top
    assert len(data) < 2800, len(data)
