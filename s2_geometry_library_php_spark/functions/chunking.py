"""Context-window document chunking (the embedding / training prep
op: split each document into fixed-token windows with overlap, so a
long page becomes model-sized pieces — RAG indexers and pretraining
tokenizer pipelines both start here).

``chunk_documents`` emits one row per (document, window): tokens are
whitespace-split (the same tokenizer as
``functions/text.token_count_column``), windows start every
``stride`` tokens and carry ``window`` tokens (the last window is
shorter; a document shorter than one window yields exactly one
chunk).  ``chunk_id`` is the 0-based window index, so
``(doc_id, chunk_id)`` is a stable key and chunk boundaries are
reproducible forever.

Scale shape (the 100 TB story): one narrow projection — ``split`` →
``sequence`` of window starts → ``transform``/``slice`` →
``posexplode`` — entirely JVM-side inside whole-stage codegen, **zero
shuffles**, and the pre-explode plan prunes every untouched column.
Output size is input size × ``window/stride`` overlap factor, which
the caller controls.

No reference counterpart (the reference is a geometry library); this
is the LLM-data-pipeline layer (SURVEY "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import WS_CLASS

DEFAULT_WINDOW = 256
DEFAULT_STRIDE = 192


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
    stride: int = DEFAULT_STRIDE,
) -> DataFrame:
    """One row per token window: ``(doc_id, chunk_id, chunk_text,
    n_chunk_tokens)``.  Empty/whitespace-only text yields one empty
    chunk (row preserved — downstream gates decide)."""
    if not (0 < stride <= window):
        raise ValueError(
            f"need 0 < stride <= window, got stride={stride} "
            f"window={window}"
        )
    w, s = int(window), int(stride)
    toks = F.split(F.trim(F.col(text_col)), WS_CLASS + "+")
    # trim+split gives [''] on empty text; keep its single empty chunk
    n = F.size(toks)
    # window starts: 0, s, 2s, ... while start < n and (first window
    # or the window adds tokens beyond the previous one)
    last_start = F.greatest(
        F.lit(0),
        F.floor((n - F.lit(w) + F.lit(s) - F.lit(1)) / F.lit(s))
        .cast("int"),
    )
    starts = F.sequence(F.lit(0), last_start * F.lit(s), F.lit(s))
    chunks = F.transform(
        starts,
        lambda st: F.struct(
            F.array_join(
                F.slice(toks, st + F.lit(1), F.lit(w)), " "
            ).alias("chunk_text"),
            F.least(n - st, F.lit(w)).alias("n_chunk_tokens"),
        ),
    )
    n_tok = F.when(
        F.length(F.col("c.chunk_text")) == 0, F.lit(0)
    ).otherwise(F.col("c.n_chunk_tokens"))
    return docs.select(
        "doc_id",
        F.posexplode(chunks).alias("chunk_id", "c"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
        n_tok.cast("long").alias("n_chunk_tokens"),
    )


def chunk_documents_duckdb(
    window: int = DEFAULT_WINDOW,
    stride: int = DEFAULT_STRIDE,
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`chunk_documents` for oracle checks."""
    w, s = int(window), int(stride)
    toks = f"regexp_split_to_array(trim({text_col}), '{WS_CLASS}+')"
    return f"""
WITH base AS (
  SELECT doc_id, {toks} AS toks, len({toks}) AS n FROM {table}
), starts AS (
  SELECT doc_id, toks, n,
         unnest(range(0, greatest(1, cast(ceil((n - {w}) / {s}.0) + 1 AS BIGINT)))) AS k
  FROM base
)
SELECT doc_id, k AS chunk_id,
       array_to_string(toks[k*{s}+1 : k*{s}+{w}], ' ') AS chunk_text,
       CASE WHEN len(array_to_string(toks[k*{s}+1 : k*{s}+{w}], ' ')) = 0
            THEN 0 ELSE least(n - k*{s}, {w}) END AS n_chunk_tokens
FROM starts
"""
