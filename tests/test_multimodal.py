"""Multimodal column plumbing tests (binary payloads + stubbed decoders)."""

import pytest
from pyspark.sql import Row

from aleph2_contrib_spark.operators import multimodal as mm
from aleph2_contrib_spark.operators import similarity as sim


@pytest.fixture()
def media(spark):
    return spark.createDataFrame(
        [
            Row(__source_file="a.img", content=bytes([1, 2, 3])),
            Row(__source_file="b.img", content=bytes([4, 5, 6])),
            Row(__source_file="c.img", content=bytes([1, 2, 3])),  # dup payload
        ]
    )


def test_metadata_extraction_with_fake_decoder(spark, media):
    out = mm.extract_media_metadata(media, decoder=mm.fake_decoder)
    rows = {r["__source_file"]: r for r in out.collect()}
    assert set(rows) == {"a.img", "b.img", "c.img"}
    assert rows["a.img"]["mime"] == "image/fake"
    # deterministic: same payload → same metadata
    assert rows["a.img"]["width"] == rows["c.img"]["width"]
    assert "content" not in out.columns  # payload dropped from metadata table


def test_default_decoder_is_stubbed(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|decoder"):
        mm.extract_media_metadata(media).collect()


def test_feature_extraction_feeds_similarity(spark, media):
    feats = mm.extract_media_features(media, decoder=mm.fake_decoder)
    rows = feats.collect()
    assert all(len(r["embedding"]) == 16 for r in rows)
    # duplicate payloads → identical embeddings → cosine 1.0 pair
    pairs = sim.all_pairs_above(
        feats.withColumnRenamed("__source_file", "vec_id"), threshold=0.9999, n_planes=2
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ("a.img", "c.img") in got


def test_combined_extract_matches_two_pass(spark, media):
    """extract_media (single decode) must equal extract_media_metadata ⋈
    extract_media_features — same rows, same values, one decoder call."""
    both = mm.extract_media(media, decoder=mm.fake_decoder)
    meta = mm.extract_media_metadata(media, decoder=mm.fake_decoder)
    feats = mm.extract_media_features(media, decoder=mm.fake_decoder)
    joined = meta.join(feats, "__source_file")
    cols = sorted(both.columns)
    a = sorted(map(tuple, both.select(*cols).collect()))
    b = sorted(map(tuple, joined.select(*cols).collect()))
    assert a == b


def test_combined_extract_null_embedding_on_dim_mismatch(spark, media):
    """A decoder yielding the wrong feature width keeps the metadata row
    with embedding NULL (the two-pass inner join would DROP it — the
    combined pass is strictly more informative)."""

    def short_features(payload):
        d = mm.fake_decoder(payload)
        d["features"] = d["features"][:4]
        return d

    out = mm.extract_media(media, decoder=short_features).collect()
    assert len(out) == 3
    assert all(r["embedding"] is None for r in out)
    assert all(r["mime"] == "image/fake" for r in out)


def test_frame_sampling_with_fake_extractor(spark, media):
    def fake_frames(payload, every_n):
        return [payload + bytes([i]) for i in range(3)]

    out = mm.sample_frames(media, every_n=5, frame_extractor=fake_frames)
    rows = out.collect()
    assert len(rows) == 9
    assert {r["frame_idx"] for r in rows} == {0, 1, 2}


def test_frame_sampling_default_stub(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        mm.sample_frames(media).collect()


def test_resize_with_fake_resizer(spark, media):
    from aleph2_contrib_spark.operators.multimodal import resize_images

    def fake_resizer(payload, w, h):
        return payload[: w * h % 32 + 1]

    out = resize_images(media, 8, 8, resizer=fake_resizer).collect()
    assert len(out) == media.count()
    assert all(r["width"] == 8 and r["height"] == 8 for r in out)
    assert all(isinstance(r["content"], (bytes, bytearray)) for r in out)


def test_resize_default_stub(spark, media):
    import pytest as _pytest

    from aleph2_contrib_spark.operators.multimodal import resize_images

    with _pytest.raises(Exception, match="PIL"):
        resize_images(media, 8, 8).collect()


def test_sample_frames_real_mjppm_container(spark):
    from aleph2_contrib_spark.operators.codecs import (
        decode_ppm,
        encode_mjppm,
        encode_ppm,
        mjppm_frame_extractor,
    )
    from aleph2_contrib_spark.operators.multimodal import sample_frames

    frames = [encode_ppm(2, 2, bytes([j] * 12)) for j in range(5)]
    df = spark.createDataFrame(
        [("v1", bytearray(encode_mjppm(frames)))], "`__source_file` string, content binary"
    )
    got = sample_frames(df, every_n=2, frame_extractor=mjppm_frame_extractor).collect()
    assert [(r["frame_idx"], bytes(r["frame"])) for r in sorted(got, key=lambda r: r["frame_idx"])] == [
        (0, frames[0]), (1, frames[2]), (2, frames[4]),
    ]
    # sampled frames decode back to real pixels
    w, h, rgb = decode_ppm(bytes(sorted(got, key=lambda r: r["frame_idx"])[1]["frame"]))
    assert (w, h, rgb) == (2, 2, bytes([2] * 12))


def test_dhash_bits_known_gradients():
    from aleph2_contrib_spark.operators.multimodal import dhash_bits

    # horizontal gradient: every right sample strictly brighter -> all
    # 64 bits set
    w, h = 18, 16
    rgb = bytes(
        c
        for y in range(h)
        for x in range(w)
        for c in (x * 10, x * 10, x * 10)
    )
    _, _, lo, hi = dhash_bits(w, h, rgb)
    assert lo == 0xFFFFFFFF and hi == 0xFFFFFFFF
    # flat image -> no bit set
    flat = bytes(128 for _ in range(w * h * 3))
    _, _, lo2, hi2 = dhash_bits(w, h, flat)
    assert lo2 == 0 and hi2 == 0
    # vertical gradient: rows uniform -> no left/right differences
    vert = bytes(
        c for y in range(h) for x in range(w) for c in (y * 9, y * 9, y * 9)
    )
    _, _, lo3, hi3 = dhash_bits(w, h, vert)
    assert lo3 == 0 and hi3 == 0


def test_image_dhash_roundtrip_png_matches_pure(spark):
    import pandas as pd
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.codecs import encode_png
    from aleph2_contrib_spark.operators.multimodal import dhash_bits, image_dhash

    rows, want = [], {}
    for did in range(8):
        w, h = 5 + did % 4, 4 + did % 3
        rgb = bytes(
            c
            for k in range(w * h)
            for c in ((did * 37 + k * 11) % 256,) * 3
        )
        rows.append(Row(doc_id=did, content=bytearray(encode_png(w, h, rgb))))
        want[did] = dhash_bits(w, h, rgb)
    out = {
        r.doc_id: (r.width, r.height, r.dhash_lo, r.dhash_hi)
        for r in image_dhash(spark.createDataFrame(rows)).collect()
    }
    assert out == want
