import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from flox_spark.operators.multimodal import (
    media_from_documents,
    resize_media,
    sample_frames,
)
from flox_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _media(spark):
    return media_from_documents(load_table(spark, SF, "documents"))


def test_sample_frames_declarative_no_udf(spark):
    media = _media(spark).limit(50)
    out = sample_frames(media, every_n=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan and "Python" not in plan
    rows = out.collect()
    assert rows
    # n_frames=1 in the fake meta -> every doc emits exactly frame 0
    assert {r["frame_idx"] for r in rows} == {0}
    assert all(r["frame_bytes"] > 0 for r in rows)


def test_sample_frames_multiframe_slicing(spark):
    # 10 frames of 4 bytes each; every_n=3 -> frames 0,3,6,9
    payload = bytes(range(40))
    pdf = pd.DataFrame({"media_id": [1], "content": [payload]})
    df = spark.createDataFrame(pdf).withColumn(
        "meta",
        F.struct(
            F.lit("fake").alias("format"),
            F.lit(4).alias("width"),
            F.lit(1).alias("height"),
            F.lit(0).alias("sample_rate"),
            F.lit(10).alias("n_frames"),
        ),
    )
    rows = sorted(
        (r["frame_idx"], bytes(r["frame"])) for r in sample_frames(df, every_n=3).collect()
    )
    assert [i for i, _ in rows] == [0, 3, 6, 9]
    assert rows[0][1] == payload[0:4]
    assert rows[1][1] == payload[12:16]
    assert rows[3][1] == payload[36:40]


def test_resize_block_mean_matches_numpy(spark):
    # 4x4 grid of known bytes -> 2x2 area means
    payload = bytes(range(16))
    pdf = pd.DataFrame({"media_id": [7], "content": [payload]})
    df = spark.createDataFrame(pdf).withColumn(
        "meta",
        F.struct(
            F.lit("fake").alias("format"),
            F.lit(4).alias("width"),
            F.lit(4).alias("height"),
            F.lit(0).alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ),
    )
    row = resize_media(df, out_h=2, out_w=2).collect()[0]
    img = np.arange(16, dtype=np.float64).reshape(4, 4)
    want = [
        img[0:2, 0:2].mean(), img[0:2, 2:4].mean(),
        img[2:4, 0:2].mean(), img[2:4, 2:4].mean(),
    ]
    assert row["pixels"] == pytest.approx(want)
    assert row["out_h"] == 2 and row["out_w"] == 2


def test_resize_on_media_table_shape_and_determinism(spark):
    media = _media(spark).limit(20)
    a = sorted((r["media_id"], tuple(r["pixels"])) for r in resize_media(media, 4, 4).collect())
    b = sorted(
        (r["media_id"], tuple(r["pixels"]))
        for r in resize_media(media.repartition(5), 4, 4).collect()
    )
    assert a == b
    assert all(len(px) == 16 for _, px in a)


def test_media_features_long_matches_wide(spark):
    # long form = posexplode(media_features().feature), value for value
    from flox_spark.operators.multimodal import (
        media_features,
        media_features_long,
        media_from_documents,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    media = media_from_documents(docs)
    wide = (
        media_features(media, dim=16)
        .select("media_id", "n_bytes", F.posexplode("feature").alias("pos", "v"))
        .collect()
    )
    long = media_features_long(media, dim=16).collect()
    w = {(r["media_id"], r["pos"]): (r["n_bytes"], round(float(r["v"]), 9)) for r in wide}
    l = {(r["media_id"], r["pos"]): (r["n_bytes"], round(float(r["feat_value"]), 9)) for r in long}
    assert w == l and len(w) == 50 * 16


def test_media_features_long_rejects_big_dim(spark):
    from flox_spark.operators.multimodal import media_features_long, media_from_documents

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(5)
    with pytest.raises(ValueError):
        media_features_long(media_from_documents(docs), dim=40)
