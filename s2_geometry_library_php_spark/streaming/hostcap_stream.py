"""Streaming per-host capping (SURVEY.md §2.10 × the curation layer):
admit documents from an unbounded crawl stream only while their host's
admitted count is below ``cap`` — the streaming twin of
``functions/hostcap.cap_per_host``.

Contract: like first-seen streaming dedup, admission is
ARRIVAL-ORDER-FIRST across micro-batches (a crawl frontier admits the
budget to whoever arrives while it lasts); WITHIN a micro-batch the
rows are ordered by the engine's deterministic (priority, doc_id)
pair first, so replaying the same batched input admits the same set.
The batch operator's global (priority, doc_id) top-K needs the whole
corpus and is the right tool for bounded data; the streaming form
trades that for O(1) state per host.

State: ONE integer per host (``applyInPandasWithState``, update on
every batch the host appears in, no timeout — host cardinality is the
state bound, the same order as the canonical-URL dedup state).
Output (append): ``(doc_id, host, host_rank)`` for ADMITTED rows only;
join back on doc_id for the full columns.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.hostcap import host_column
from ..operators.sampling import DEFAULT_SALT, sample_priority_column

STATE_SCHEMA = StructType([StructField("admitted", LongType())])

OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("host", StringType()),
        StructField("host_rank", LongType()),
    ]
)


def _make_admitter(cap: int):
    def _admit(key, pdf_iter, state: GroupState):
        host = str(key[0])
        admitted = state.get[0] if state.exists else 0
        budget = cap - admitted
        # a group's micro-batch rows may arrive as SEVERAL Arrow
        # chunks in arbitrary order; the documented contract sorts the
        # WHOLE batch by (priority, doc_id), so keep a running
        # best-`budget` merge across chunks — O(budget) state, never
        # the whole hot host in memory
        best = None
        for pdf in pdf_iter:
            if budget <= 0:
                continue  # budget gone; drain the iterator cheaply
            cand = pdf[["doc_id", "_pri"]]
            if best is not None:
                cand = pd.concat([best, cand], ignore_index=True)
            best = cand.sort_values(
                ["_pri", "doc_id"], kind="mergesort"
            ).head(budget)
        take = 0 if best is None else len(best)
        out_ids = (
            [int(i) for i in best["doc_id"]] if take else []
        )
        state.update((admitted + take,))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_ids, dtype="int64"),
                "host": pd.Series([host] * take, dtype="object"),
                "host_rank": pd.Series(
                    range(admitted + 1, admitted + take + 1),
                    dtype="int64",
                ),
            }
        )

    return _admit


def streaming_cap_per_host(
    stream_docs: DataFrame,
    cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """streaming docs -> admitted ``(doc_id, host, host_rank)`` rows
    (append mode), at most ``cap`` per host over the stream's
    lifetime."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    keyed = stream_docs.select(
        F.col(id_col).alias("doc_id"),
        host_column(url_col).alias("host"),
        sample_priority_column(id_col, salt).alias("_pri"),
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _make_admitter(cap),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


__all__ = ["streaming_cap_per_host", "OUTPUT_SCHEMA", "STATE_SCHEMA"]
