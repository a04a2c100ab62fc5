"""Document chunking: fixed-width token windows with overlap.

The passage-extraction step embedding/retrieval and long-document
training pipelines run before vectorizing (RAG passage windows,
BERT-style 512-token windows with stride): each document becomes
ceil-many fixed-width windows, consecutive windows sharing ``overlap``
tokens, the LAST window clamped back so it stays full-width (the
sliding-window convention; no ragged tail unless the whole document is
shorter than one window).

Frozen window rules (engine-portable, all integer arithmetic), with
stride = chunk_tokens - overlap (must be > 0):

``last_window="clamp"`` (default; the embedding/RAG convention):
  n <= chunk_tokens      -> one window [0, n)
  n >  chunk_tokens      -> K = ceil((n - chunk_tokens) / stride) + 1
                            start_k = min(k * stride, n - chunk_tokens)
  Every window is exactly ``chunk_tokens`` wide (the clamp makes the
  last one re-cover earlier tokens instead of running short) — NOT a
  partition even at overlap 0.

``last_window="ragged"`` (the packing/training convention):
  K = max(1, ceil((n - overlap) / stride)), start_k = k * stride,
  width_k = min(chunk_tokens, n - start_k).  The tail window runs
  short; at overlap 0 the windows exactly partition the document
  (round-trip pinned by test).

Both rules cover every token with strictly increasing starts.

Plan shape (the 100-TB consideration): this is a pure map-side
explode — split once per document (own projection, see
decontaminate._gram_rows for why), generate K window structs in-row,
explode.  NO shuffle, NO window function, NO UDF; the operator
composes with a downstream repartition/write and inherits the scan's
parallelism.  Output rows carry (doc_id, chunk_idx) so any downstream
embedding or dedup stage can re-aggregate per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import _idiv


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_tokens: int = 256,
    overlap: int = 0,
    last_window: str = "clamp",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, start_token, n_tokens, chunk_text): the
    document's whitespace tokens re-joined per sliding window."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    if last_window not in ("clamp", "ragged"):
        raise ValueError("last_window must be 'clamp' or 'ragged'")
    stride = chunk_tokens - overlap
    toks = F.col("__toks")
    n = F.size(toks).cast("bigint")
    # K windows; ceil via exact integer division on non-negative args
    if last_window == "clamp":
        k_windows = F.when(
            n <= chunk_tokens, F.lit(1).cast("bigint")
        ).otherwise(
            _idiv(n - F.lit(chunk_tokens) + F.lit(stride - 1), F.lit(stride))
            + F.lit(1)
        )
    else:
        k_windows = F.greatest(
            F.lit(1).cast("bigint"),
            _idiv(
                F.greatest(n - F.lit(overlap), F.lit(0).cast("bigint"))
                + F.lit(stride - 1),
                F.lit(stride),
            ),
        )

    def _chunk(k):
        # window geometry per chunk index; __toks is the materialized
        # split (built once per doc in its own projection), so the
        # in-lambda slice is O(chunk) per window, never O(doc) re-split
        if last_window == "clamp":
            start = F.least(
                k * F.lit(stride),
                F.greatest(n - F.lit(chunk_tokens), F.lit(0).cast("bigint")),
            )
        else:
            start = k * F.lit(stride)
        width = F.least(F.lit(chunk_tokens).cast("bigint"), n - start)
        return F.struct(
            k.cast("bigint").alias("chunk_idx"),
            start.alias("start_token"),
            width.alias("n_tokens"),
            F.concat_ws(
                " ",
                F.slice(toks, (start + F.lit(1)).cast("int"),
                        width.cast("int")),
            ).alias("chunk_text"),
        )

    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("__toks"),
        )
        # chunk structs built in-row, THEN exploded: the generate emits
        # only (doc_id, small struct) rows — the token array never rides
        # through the explode
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0).cast("bigint"), k_windows - F.lit(1)
                    ),
                    _chunk,
                )
            ).alias("__s"),
        )
        .select(
            "doc_id",
            F.col("__s.chunk_idx").alias("chunk_idx"),
            F.col("__s.start_token").alias("start_token"),
            F.col("__s.n_tokens").alias("n_tokens"),
            F.col("__s.chunk_text").alias("chunk_text"),
        )
    )
