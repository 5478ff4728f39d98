"""Snappy block codec (operators/snappy_codec): cross-verified both
directions against pyarrow's bundled snappy — the one independent
implementation in this environment — plus the Avro container wiring
(per-block CRC32, corruption refusals)."""

from __future__ import annotations

import random

import pytest

from verified_sources_spark.operators.snappy_codec import (
    SnappyError,
    snappy_compress,
    snappy_decompress,
)

CASES = [
    b"",
    b"a",
    b"hello hello hello hello hello!",
    bytes(1000),                                   # long zero run
    b"abcd" * 10_000,                              # periodic
    ("the quick brown fox " * 500).encode(),       # prose-ish
    bytes(range(256)) * 300,                       # long-period cycle
]


@pytest.mark.parametrize("i", range(len(CASES)))
def test_cross_verified_against_pyarrow(i):
    import pyarrow as pa

    data = CASES[i]
    ours = snappy_compress(data)
    # ours -> pyarrow
    assert pa.decompress(ours, decompressed_size=len(data),
                         codec="snappy").to_pybytes() == data
    # pyarrow -> ours
    theirs = pa.compress(data, codec="snappy").to_pybytes()
    assert snappy_decompress(theirs) == data
    # ours -> ours
    assert snappy_decompress(ours) == data


def test_incompressible_random_round_trips():
    import pyarrow as pa

    rng = random.Random(13)
    data = bytes(rng.randrange(256) for _ in range(50_000))
    ours = snappy_compress(data)
    assert snappy_decompress(ours) == data
    assert pa.decompress(ours, decompressed_size=len(data),
                         codec="snappy").to_pybytes() == data


def test_overlapping_copy_decodes():
    # a run encoded as literal+overlapping copy (offset < length):
    # varint(8), literal 'ab', copy len 6 offset 2
    stream = bytes([8, 0b0000_0100]) + b"ab" + bytes([(5 << 2) | 2, 2, 0])
    assert snappy_decompress(stream) == b"abababab"


@pytest.mark.parametrize("bad", [
    b"",                            # empty: no preamble
    b"\xff\xff\xff\xff\xff\xff",    # runaway varint
    b"\x10",                        # declares 16 bytes, no elements
    b"\x05\x00abc",                 # literal truncated vs declaration
    b"\x04\x05\x01\x00",            # copy offset beyond produced bytes
    b"\x02\xf0",                    # literal length bytes truncated
])
def test_malformed_refuses_by_name(bad):
    with pytest.raises(SnappyError):
        snappy_decompress(bad)


def test_declared_length_gate():
    with pytest.raises(SnappyError, match="over gate"):
        snappy_decompress(b"\x80\x80\x80\x80\x01", max_len=1 << 20)


def test_avro_container_snappy_round_trip_and_crc():
    from verified_sources_spark.operators.avro_codec import (
        AvroError, read_container, write_container,
    )

    schema = {"type": "record", "name": "R", "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": "string"}]}
    recs = [{"id": i, "s": f"row {i} " * 10} for i in range(50)]
    blob = write_container(schema, recs, codec="snappy")
    got_schema, got = read_container(blob)
    assert got == recs
    # flip any byte in the block region (count varint, size varint,
    # compressed payload, CRC): the snappy decode, the CRC32 check or
    # the sync-marker check must refuse — never a silent wrong answer
    block_start = blob.index(b"verified-sources") + 16
    for i in range(block_start, len(blob) - 16, 3):
        b = bytearray(blob)
        b[i] ^= 0x40
        with pytest.raises(AvroError):
            read_container(bytes(b))
