"""Multimodal plumbing: schemas, batch shapes, determinism, fan-out.

The decode is a documented deterministic stub; what these tests pin is
the REAL contract — binary+metadata schema through mapInPandas, output
schemas, per-kind filtering, frame fan-out arithmetic, and run-to-run
determinism (same payload bytes → same features on any partitioning).
"""

from __future__ import annotations

from ocr_image_to_text_spark import multimodal as mm


def test_image_features_schema_and_determinism(spark):
    media = mm.synthetic_media(spark, n=30)
    f1 = mm.image_features(media, partitions=4).orderBy("media_id").collect()
    f2 = mm.image_features(media.repartition(7), partitions=2) \
        .orderBy("media_id").collect()
    assert [r.asDict() for r in f1] == [r.asDict() for r in f2]
    assert len(f1) == 10  # n/3 images
    r = f1[0]
    assert set(r.asDict()) == {"media_id", "width", "height", "mean_r",
                               "mean_g", "mean_b", "phash"}
    assert 0.0 <= r.mean_r <= 255.0
    assert isinstance(r.phash, int)


def test_image_resize_caps_max_side(spark):
    media = mm.synthetic_media(spark, n=30)
    out = mm.image_resize(media, max_side=40).collect()
    for r in out:
        assert max(r.width, r.height) <= 40
        assert len(r.payload) == r.width * r.height * 3


def test_frame_sample_fanout(spark):
    media = mm.synthetic_media(spark, n=30)
    frames = mm.frame_sample(media, every_ms=1000)
    per = {r.media_id: r.n for r in
           frames.groupBy("media_id").count().withColumnRenamed("count", "n")
           .collect()}
    metas = {r.media_id: r.meta.duration_ms
             for r in media.filter("kind = 'video'").collect()}
    assert per.keys() == metas.keys()
    for mid, dur in metas.items():
        assert per[mid] == len(range(0, max(dur, 1), 1000))


def test_audio_features(spark):
    media = mm.synthetic_media(spark, n=30)
    out = mm.audio_features(media).collect()
    assert len(out) == 10
    for r in out:
        assert 0.0 < r.rms < 1.0
        assert r.zero_cross > 0
