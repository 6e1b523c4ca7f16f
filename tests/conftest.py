import pytest


@pytest.fixture(scope="session")
def spark():
    from ocr_image_to_text_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def t1_paths():
    from ocr_image_to_text_spark.golden import ensure_goldens
    from ocr_image_to_text_spark.transcripts import ensure_transcripts

    return {"transcripts": ensure_transcripts("t1"), **ensure_goldens("t1")}
