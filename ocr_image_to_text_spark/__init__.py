"""ocr_image_to_text_spark — a PySpark-native main-content extraction engine.

Re-creates the computational semantics of the reference repo
(Rayyan9477/OCR-Image-to-text, read-only snapshot at /root/reference):
token-box confidence filtering, reading-order reconstruction (y-clustering
into lines, x-sort within lines), noise/boilerplate stripping, cleaning,
chunking, entity extraction and keyword retrieval — expressed Spark-first
(DataFrame ops + vectorized pandas/Arrow UDFs, no per-row Python) over a
table of multi-turn transcripts

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

emitting per-turn extracted main text plus character spans

    spans(conv_id, turn_idx, span_start, span_end, text)

and a per-turn rollup with extraction metrics.

The pure-Python oracle lives in :mod:`ocr_image_to_text_spark.pyref`
(near-literal restatement of the reference functions, with file:line
citations); the Spark implementation is independent (numpy-vectorized) and
is tested for byte-equality against the oracle.
"""

__version__ = "0.1.0"
