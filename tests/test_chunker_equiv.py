"""X3 chunker: the Spark-side implementation must equal the pyref oracle.

The two implementations are structurally similar (both restate
ocr_app/utils/text_utils.py:36-90), so the risk is a silent divergence in
the cleaning-regex prelude or the word-pack accounting — exactly what the
hypothesis strategy targets (unicode whitespace, long words, newline runs,
non-ASCII, words longer than the chunk size).
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_image_to_text_spark import pyref
from ocr_image_to_text_spark.operators.chunker import split_chunks_one

_TEXT = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.sampled_from("\n\t\r\x0b\x0c\xa0 　日łé"),
    ),
    max_size=800,
)


@given(_TEXT)
@settings(max_examples=500, deadline=None)
def test_split_chunks_one_equals_pyref(text):
    assert split_chunks_one(text) == pyref.split_text_into_chunks(text)


@given(st.lists(st.text(alphabet="ab \n", min_size=0, max_size=30), max_size=20),
       st.integers(min_value=10, max_value=60))
@settings(max_examples=200, deadline=None)
def test_split_chunks_param_equivalence(words, chunk_size):
    """Non-default chunk_size/overlap exercise the suffix-overlap loop."""
    text = " ".join(words)
    assert split_chunks_one(text, chunk_size, 5) == \
        pyref.split_text_into_chunks(text, chunk_size, 5)


def test_udf_end_to_end_matches_pyref(spark, t1_paths):
    """The Arrow-batched UDF over real extracted turns == pyref per turn."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from ocr_image_to_text_spark.operators.chunker import split_chunks_udf

    ext = pq.read_table(t1_paths["extract"],
                        columns=["conv_id", "turn_idx", "extracted_text"])
    want = {}
    for cid, tix, text in zip(ext.column("conv_id").to_pylist(),
                              ext.column("turn_idx").to_pylist(),
                              ext.column("extracted_text").to_pylist()):
        if text:
            want[(cid, tix)] = pyref.split_text_into_chunks(text)
    df = (spark.read.parquet(t1_paths["extract"])
          .filter(F.length("extracted_text") > 0)
          .select("conv_id", "turn_idx",
                  split_chunks_udf(F.col("extracted_text")).alias("chunks")))
    got = {(r.conv_id, r.turn_idx): list(r.chunks) for r in df.collect()}
    assert got == want
