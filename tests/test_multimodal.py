"""Multimodal plumbing tests: real Spark schema/batching, stubbed codecs."""

import pyspark.sql.functions as F
import pytest

from frontier_engine import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(mm.gen_media(300), schema=mm.MEDIA_SCHEMA).cache()


def test_features_shape_and_determinism(spark, media):
    f1 = mm.extract_media_features(media).orderBy("media_id").collect()
    f2 = mm.extract_media_features(media, batch_partitions=7).orderBy("media_id").collect()
    assert len(f1) == 300
    assert f1 == f2  # partitioning must not change results
    imgs = [r for r in f1 if r.width is not None and r.n_frames == 1]
    assert imgs and all(16 <= r.width <= 255 for r in imgs)
    assert all(len(r.feature) == mm.FEATURE_DIM * 4 for r in f1 if r.feature)


def test_content_hash_matches_reference_semantics(media, spark):
    import hashlib

    feats = {r.media_id: r.content_hash for r in mm.extract_media_features(media).collect()}
    for row in media.limit(10).collect():
        assert feats[row.media_id] == hashlib.md5(bytes(row.content)).hexdigest()[:10]


def test_media_dedup(spark, media):
    feats = mm.extract_media_features(media)
    dd = mm.media_dedup(feats)
    # gen_media reuses content for the last ~10% of ids → dup_count > 1 somewhere
    assert dd.filter(F.col("dup_count") > 1).count() > 0
    total = dd.agg(F.sum("dup_count")).collect()[0][0]
    assert total == 300


def test_unpack_feature_vec(spark, media):
    feats = mm.unpack_feature_col(mm.extract_media_features(media))
    row = feats.filter(F.col("feature").isNotNull()).limit(1).collect()[0]
    assert len(row.feature_vec) == mm.FEATURE_DIM
    norm = sum(x * x for x in row.feature_vec) ** 0.5
    assert norm == pytest.approx(1.0, abs=1e-3)


def test_null_content_isolated(spark):
    rows = mm.gen_media(5)
    rows[2]["content"] = None
    df = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = {r.media_id: r for r in mm.extract_media_features(df).collect()}
    assert out[2].content_hash is None and out[2].feature is None  # P5: row, not exception
    assert out[0].content_hash is not None


def test_decode_falls_back_to_stub_on_undecodable_bytes():
    """PIL-gated dispatch (E19): garbage bytes use the deterministic stub
    whether or not PIL is installed."""
    from frontier_engine import multimodal

    got = multimodal._decode_image(b"definitely not an image")
    stub = multimodal._decode_image_stub(b"definitely not an image")
    assert got[:2] == stub[:2] and (got[2] == stub[2]).all()


def test_pil_real_decode_when_available():
    """Activates wherever PIL exists.  A CI runner that HAS PIL must treat
    a skip here as a FAILURE (README 'Library-gated tests')."""
    PIL = pytest.importorskip(
        "PIL.Image",
        reason="PIL not installed in this sandbox — a CI runner that HAS it "
        "must treat this skip as a FAILURE (README 'Library-gated tests')",
    )
    import io

    from frontier_engine import multimodal

    buf = io.BytesIO()
    PIL.new("RGB", (12, 7)).save(buf, format="PNG")
    w, h, px = multimodal._decode_image(buf.getvalue())
    assert (w, h) == (12, 7)
    assert len(px) == 12 * 7 * 3


def test_resize_images_contract(spark, media):
    """Resize: longer side capped at max_dim, small images pass through
    byte-identical, output deterministic across runs."""
    from frontier_engine.multimodal import resize_images

    imgs = media.filter("media_type = 'images'")
    out = resize_images(imgs, max_dim=64).collect()
    assert out, "fixture must contain images"
    src_bytes = {r["media_id"]: bytes(r["content"]) for r in imgs.collect()}
    for r in out:
        assert max(r["width"], r["height"]) <= 64
        if not r["resized"]:
            assert bytes(r["content"]) == src_bytes[r["media_id"]]
        else:
            assert bytes(r["content"]) != src_bytes[r["media_id"]]
    again = {r["media_id"]: (r["width"], r["height"], bytes(r["content"]))
             for r in resize_images(imgs, max_dim=64).collect()}
    assert again == {r["media_id"]: (r["width"], r["height"], bytes(r["content"])) for r in out}


def test_resize_images_null_content(spark):
    from frontier_engine.multimodal import MEDIA_SCHEMA, resize_images

    rows = [(1, "u", "images", "image/png", None, None)]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    r = resize_images(df).collect()[0]
    assert r["content"] is None and r["resized"] is None


def test_pil_real_resize_when_available(spark):
    """Activates wherever PIL exists: a real decodable PNG larger than
    max_dim must come back truly re-encoded with the aspect ratio
    preserved.  A CI runner that HAS PIL must treat a skip here as a
    FAILURE (README 'Library-gated tests')."""
    PIL = pytest.importorskip(
        "PIL.Image",
        reason="PIL not installed in this sandbox — a CI runner that HAS it "
        "must treat this skip as a FAILURE (README 'Library-gated tests')",
    )
    import io

    from frontier_engine.multimodal import MEDIA_SCHEMA, resize_images

    buf = io.BytesIO()
    PIL.new("RGB", (200, 100)).save(buf, format="PNG")
    rows = [(1, "u", "images", "image/png", buf.getvalue(), buf.getbuffer().nbytes)]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    r = resize_images(df, max_dim=64).collect()[0]
    assert r["resized"] is True
    assert (r["width"], r["height"]) == (64, 32)
    with PIL.open(io.BytesIO(bytes(r["content"]))) as img:
        assert (img.width, img.height) == (64, 32)
