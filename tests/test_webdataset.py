"""WebDataset shards (llm/webdataset): adjacency grouping, key/ext
parsing, refusals, and the export→readback Spark round trip."""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.webdataset import (
    WdsError,
    encode_wds,
    iter_wds_samples,
    wds_samples,
    wds_shards,
)


def test_grouping_and_multi_suffix_extensions():
    samples = [("000001", {"txt": b"hello", "json": b'{"id": 1}'}),
               ("000002", {"txt": "café".encode("cp1252"),
                           "seg.png": b"\x89PNG fake",
                           "jpg": b"\xff\xd8 fake"})]
    got = list(iter_wds_samples(encode_wds(samples)))
    assert got[0] == samples[0]
    key, exts = got[1]
    assert key == "000002"
    assert set(exts) == {"txt", "seg.png", "jpg"}  # first-dot key rule


def test_refusals_by_name():
    from verified_sources_spark.llm.archives import encode_tar

    # non-adjacent key: a streaming loader would mis-group
    bad = encode_tar({"a.txt": b"x", "b.txt": b"y", "a.json": b"{}"})
    with pytest.raises(WdsError, match="non-adjacent"):
        list(iter_wds_samples(bad))
    # duplicate ext inside one sample: two a.txt entries can't
    # coexist in one dict, so use names differing only in directory
    # (the KEY is the basename prefix, so they collide)
    dup = encode_tar({"d1/a.txt": b"x", "d2/a.txt": b"y"})
    with pytest.raises(WdsError, match="duplicate extension"):
        list(iter_wds_samples(dup))
    with pytest.raises(WdsError, match="not a tar"):
        list(iter_wds_samples(b"PK\x03\x04zipzip"))
    with pytest.raises(WdsError, match="no key.ext"):
        list(iter_wds_samples(encode_tar({"READM": b"x"})))


def test_spark_export_readback(spark):
    docs = spark.createDataFrame(
        [(i, f"sample body {i}") for i in range(30)],
        "doc_id long, text string")
    shards = wds_shards(docs, n_shards=4).cache()
    assert sum(r["n_samples"] for r in shards.collect()) == 30
    back = wds_samples(
        shards.selectExpr("shard_id as doc_id", "asset")).collect()
    assert len(back) == 30 and all(r["decoded_ok"] for r in back)
    assert {r["text"] for r in back} == {
        f"sample body {i}" for i in range(30)}
    assert all(r["exts"] == "json;txt" for r in back)
    assert all(len(r["key"]) == 12 for r in back)
    # corrupt shard isolates
    bad = spark.createDataFrame([(1, bytearray(b"\x00" * 40))],
                                "doc_id long, asset binary")
    (r,) = wds_samples(bad).collect()
    assert r["decoded_ok"] is False


def test_multimodal_shards_round_trip(spark):
    """wds_multimodal_shards packs png + seg.png (multi-suffix) +
    txt + json adjacently; iter_wds_samples groups them back into one
    sample and the media bytes survive byte-exact."""
    from verified_sources_spark.llm.png_codec import encode
    from verified_sources_spark.llm.webdataset import (
        wds_multimodal_shards,
    )

    imgs = {i: encode(8, 8, bytes([i * 7 % 256]) * 192, "RGB")
            for i in range(12)}
    segs = {i: encode(8, 8, bytes([255 - i]) * 192, "RGB")
            for i in range(12)}
    docs = spark.createDataFrame(
        [(i, bytearray(imgs[i]), bytearray(segs[i]), f"cap {i}")
         for i in range(12)],
        "doc_id long, png binary, seg binary, caption string")
    shards = wds_multimodal_shards(docs, n_shards=3).collect()
    assert sum(r["n_samples"] for r in shards) == 12
    seen = {}
    for r in shards:
        for key, exts in iter_wds_samples(bytes(r["asset"])):
            assert sorted(exts) == ["json", "png", "seg.png", "txt"]
            seen[int(key)] = exts
    assert sorted(seen) == list(range(12))
    for i, exts in seen.items():
        assert exts["png"] == imgs[i]          # byte-exact
        assert exts["seg.png"] == segs[i]      # multi-suffix stayed
        assert exts["txt"].decode() == f"cap {i}"
        assert b'"id": %d' % i in exts["json"]
