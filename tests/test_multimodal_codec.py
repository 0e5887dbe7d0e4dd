"""RLE codec semantics: real encode/decode round-trip (r11 — replaces
the declared decode stub), run-cap splitting, corrupt-stream rejection,
and decode-fed perceptual signatures."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.multimodal import (
    attach_payload,
    payload_features,
    rle_decode,
    rle_encode,
)


def _payloads(spark, payloads):
    return attach_payload(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(payloads)], "id long, t string"
        ),
        "t",
        "id",
    )


def _rle_ref(data: bytes) -> bytes:
    """Independent pure-Python encoder: the numpy kernel must match."""
    out = bytearray()
    i = 0
    while i < len(data):
        j = i
        while j < len(data) and data[j] == data[i]:
            j += 1
        run = j - i
        while run > 0:
            chunk = min(run, 255)
            out += bytes([chunk, data[i]])
            run -= chunk
        i = j
    return bytes(out)


def test_rle_round_trip_and_reference_encoding(spark):
    payloads = [
        "abcd",
        "aaaabbbbcccc",
        "x",
        "a" * 300 + "b",  # run past the 255 cap: 255+45 chunks
        "ab" * 100,  # worst case: no compression, 2 bytes per run
        "",
    ]
    enc = rle_encode(_payloads(spark, payloads))
    rows = {r.doc_id: r for r in enc.collect()}
    for i, t in enumerate(payloads):
        ref = _rle_ref(t.encode())
        assert bytes(rows[i].encoded) == ref, f"payload {i}"
        assert rows[i].encoded_n == len(ref)
        assert rows[i].n_bytes == len(t)
    # "a"*300: ceil(300/255)=2 chunks + 1 for "b" -> 6 encoded bytes
    assert rows[3].encoded_n == 6
    assert bytes(rows[3].encoded) == bytes([255, 97, 45, 97, 1, 98])

    dec = {r.doc_id: r for r in rle_decode(enc).collect()}
    for i, t in enumerate(payloads):
        assert bytes(dec[i].decoded) == t.encode(), f"payload {i}"
        assert dec[i].decoded_n == len(t)
        assert dec[i].decoded_sum == sum(t.encode())


def test_rle_roundtrip_fused_equals_chained(spark):
    """r13: the fused one-crossing round-trip must be row/column
    identical to rle_decode(rle_encode(df)) — same kernels back to back,
    one Arrow boundary instead of two."""
    from synthea2omop_etl_spark.llm_ops.multimodal import rle_roundtrip

    payloads = ["abcd", "aaaabbbbcccc", "x", "a" * 300 + "b", "ab" * 100,
                ""]
    mm = _payloads(spark, payloads)
    chained = sorted(tuple(r) for r in rle_decode(rle_encode(mm)).collect())
    fused = sorted(tuple(r) for r in rle_roundtrip(mm).collect())
    assert fused == chained and fused


def test_rle_decode_rejects_corrupt_stream(spark):
    from pyspark.sql import types as T

    from synthea2omop_etl_spark.llm_ops.multimodal import RLE_SCHEMA

    bad = spark.createDataFrame(
        [(1, 3, bytes([2, 97, 98]), 3)], RLE_SCHEMA
    )
    with pytest.raises(Exception, match="corrupt RLE stream"):
        rle_decode(bad).collect()
    assert isinstance(RLE_SCHEMA, T.StructType)


def test_features_over_decoded_equal_features_over_original(spark):
    """The production chain (encode → decode → featurize) must yield the
    same features as featurizing the original payload directly — the
    round-trip identity that makes decode-fed grading meaningful."""
    payloads = ["hello world " * 10, "zzzzzz", "q"]
    src = _payloads(spark, payloads)
    direct = {
        r.doc_id: r for r in payload_features(src).collect()
    }
    chained = {
        r.doc_id: r
        for r in payload_features(
            rle_decode(rle_encode(src)), payload_col="decoded"
        ).collect()
    }
    assert set(direct) == set(chained)
    for k in direct:
        assert direct[k].sum_bytes == chained[k].sum_bytes
        assert direct[k].band_sums == chained[k].band_sums
        assert direct[k].mean_byte == chained[k].mean_byte


def test_perceptual_signatures_from_decoded_match_original(spark):
    from synthea2omop_etl_spark.llm_ops.dedup import perceptual_signatures

    payloads = ["the quick brown fox " * 8, "a" * 32 + "cd" * 16]
    src = spark.createDataFrame(
        [(i, t) for i, t in enumerate(payloads)],
        "doc_id long, text string",
    )
    orig = {
        r.doc_id: (r.phash_bands, r.dhash_bands)
        for r in perceptual_signatures(src).collect()
    }
    dec = rle_decode(rle_encode(attach_payload(src, "text", "doc_id")))
    decoded_text = dec.select(
        "doc_id", F.decode("decoded", "UTF-8").alias("text")
    )
    via_codec = {
        r.doc_id: (r.phash_bands, r.dhash_bands)
        for r in perceptual_signatures(decoded_text).collect()
    }
    assert orig == via_codec
