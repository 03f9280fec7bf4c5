"""Multimodal-column operators: binary payloads, frame sampling,
Arrow-batched feature extraction, checksum dedup, decode gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_cudf_spark.operators.multimodal import (
    attach_payload,
    decode_payload,
    dedup_payloads,
    extract_features,
    sample_frames,
)
from dask_cudf_spark.sources import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return attach_payload(load_table(spark, SF_DIR, "documents"))


def test_payload_schema(docs):
    types = dict(docs.dtypes)
    assert types["payload"] == "binary"
    assert types["meta"] == "struct<modality:string,n_bytes:bigint,checksum:string>"


def test_metadata_matches_bytes(docs):
    bad = docs.filter(
        F.col("meta.n_bytes") != F.octet_length("payload")
    ).count()
    assert bad == 0


def test_frame_sampling_counts(docs):
    frames = sample_frames(docs, frame_bytes=64, stride=32)
    # every frame is exactly frame_bytes long (partial tails dropped)
    assert frames.filter(F.octet_length("frame") != 64).count() == 0
    # closed-form frame count per doc
    got = (
        frames.groupBy("doc_id").count().withColumnRenamed("count", "n")
    )
    expect = docs.select(
        "doc_id",
        F.when(
            F.col("meta.n_bytes") >= 64,
            ((F.col("meta.n_bytes") - 64) / 32).cast("long") + 1,
        )
        .otherwise(0)
        .alias("want"),
    )
    bad = got.join(expect, "doc_id").filter(F.col("n") != F.col("want")).count()
    assert bad == 0


def test_frames_reconstruct_payload_prefix(spark, docs):
    # stride == frame size -> frames tile the payload; concat rebuilds it
    one = docs.filter(F.col("doc_id") == 0)
    n = one.select(F.col("meta.n_bytes")).first()[0]
    frames = sample_frames(one, frame_bytes=16, stride=16)
    rebuilt = (
        frames.orderBy("frame_idx")
        .agg(F.concat_ws("", F.collect_list(F.col("frame").cast("string"))))
        .first()[0]
    )
    text = one.select("text").first()[0]
    assert rebuilt == text[: (n // 16) * 16]


def test_extract_features_deterministic(spark, docs):
    feats = extract_features(docs.filter(F.col("doc_id") < 50)).toPandas()
    assert len(feats) == 50
    texts = dict(
        docs.filter(F.col("doc_id") < 50).select("doc_id", "text").collect()
    )
    row = feats.set_index("doc_id").loc[7]
    raw = texts[7].encode()
    assert row["n_bytes"] == len(raw)
    assert row["byte_min"] == min(raw)
    assert row["byte_max"] == max(raw)
    assert abs(row["byte_mean"] - round(sum(raw) / len(raw), 6)) < 1e-9


def test_dedup_payloads(spark, docs):
    deduped = dedup_payloads(docs, "payload")
    n_distinct = docs.select(F.sha2("payload", 256)).distinct().count()
    assert deduped.count() == n_distinct


def test_decode_is_gated(docs):
    with pytest.raises(NotImplementedError, match="codec"):
        decode_payload(docs)
