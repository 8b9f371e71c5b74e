"""Common-Crawl-style Python DataSources (Spark 4 ``pyspark.sql.datasource``).

The BASELINE input hint describes the production input as an Iceberg
table of Common-Crawl-style web pages ``(url, warc_ts, html, text,
lang)``.  In production the scan side of that story is a real
connector; in this sandbox the same connector surface is exercised by
two registered Python DataSources:

* ``s2crawl``  — a *reader* (batch + micro-batch streaming) that
  synthesizes WARC-shaped pages deterministically, executor-side, one
  input partition per crawl segment.  Nothing is materialized on the
  driver: ``partitions()`` plans the segment list and every segment
  generates its own rows as **pyarrow RecordBatches** (the vectorized
  read path — no per-row Python).  A real deployment would replace the
  synthesis inside :meth:`CrawlReader.read` with a WARC/Iceberg block
  reader and keep every other line.
* ``s2metrics`` — a *writer* (batch + streaming) implementing the
  commit-coordinator pattern the north-star asks for ("checkpoints
  per-partition lineage and metrics"): each task writes its own
  per-partition metrics JSON and returns a ``WriterCommitMessage``;
  only the DRIVER's ``commit()`` writes the manifest, so a manifest is
  present iff every task of the attempt succeeded (same contract as
  ``plans/lineage.LineageLog``).

Scale design notes
------------------
* Segments are the unit of parallelism (like WARC files): 100 TB ~
  1.2M segments of ~80 MB; ``partitions()`` is O(#segments) driver
  memory, nothing else grows with data size.
* ``pushFilters`` (Spark 4.1) accepts ``doc_id`` range comparisons and
  ``lang`` equality: doc_id bounds prune WHOLE SEGMENTS at plan time
  (fewer tasks — the Python-source analogue of partition pruning) and
  both are applied inside the generator before Arrow batches are
  built, so filtered scans ship less data to the JVM.
* All synthesis is closed-form integer hashing of ``doc_id`` (no RNG
  state): any row can be regenerated anywhere, which is what makes
  the source deterministic under retries, speculative execution and
  resume — and lets tests assert byte-identical re-reads.

Reference anchor: the corpus shape mirrors ``sources/documents.py``
(same html template, so ``extract_text`` keeps its byte-identical
per-url invariant); ~5% of docs are exact duplicates of an earlier
doc and ~1/7 urls carry tracking query strings, so the dedup and URL
canonicalization operators have real work on this source too.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence

import numpy as np

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from .documents import _HTML_PREFIX, _HTML_SUFFIX

# --- deterministic page synthesis (int64 hashing, overflow-free) -------------

_VOCAB = (
    "the of and to in page web crawl data spark shard tile cell index "
    "query join stream batch token text html link anchor title body "
    "north south east west city river map earth sphere face level "
    "hash prefix range salt skew broadcast shuffle scan filter push "
    "down arrow vector column row group parquet segment warc record "
    "offset commit epoch task stage plan lineage metric"
).split()
assert len(_VOCAB) == 64

_LANGS = np.array(["en", "en", "en", "en", "en", "en", "de", "de", "fr", "es"])
_EPOCH_US = np.int64(1_739_404_800) * 1_000_000  # 2025-02-13 00:00:00 UTC

_MIN_WORDS, _WORD_SPAN = 20, 101  # doc length in [20, 120] words


def _h32(x: np.ndarray, salt: int, prime: int) -> np.ndarray:
    """Knuth-style multiplicative hash to [0, 2^32); int64-safe because
    the multiplicand is < 1e8 + salt (product < 2^63)."""
    return ((x % 100_000_007 + salt) * prime) % 4_294_967_296


def synth_pages(doc_ids: np.ndarray) -> dict:
    """Closed-form page synthesis for a vector of doc_ids.

    Returns plain numpy/python columns (url, warc_ts_us, html, text,
    lang).  This is the single source of truth: the batch reader, the
    stream reader and the test twin all call it, which is what makes
    streaming == batch == re-read exact."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    # ~5% exact duplicates: the dup points back at a canonical earlier id
    dup = _h32(doc_ids, 7, 2_654_435_761) % 20 == 0
    back = (_h32(doc_ids, 11, 2_246_822_519) % 1000 + 1).astype(np.int64)
    eff = np.where(dup, np.maximum(doc_ids - back, 0), doc_ids)

    n_words = (_MIN_WORDS + _h32(eff, 3, 2_654_435_761) % _WORD_SPAN).astype(np.int64)
    texts: list[str] = []
    for e, n in zip(eff.tolist(), n_words.tolist()):
        # per-word index: iterated affine hash of (eff, j) — closed form
        idx = ((e * 1_315_423_911 + np.arange(n, dtype=np.int64) * 2_654_435_761) % 4_294_967_296) % 64
        texts.append(" ".join(_VOCAB[i] for i in idx))

    lang = _LANGS[_h32(doc_ids, 23, 2_654_435_761) % 10]
    tracked = doc_ids % 7 == 0
    urls = [
        f"https://host{d % 97}.example/d/{d}" + ("?utm_source=feed&ref=crawl" if t else "")
        for d, t in zip(doc_ids.tolist(), tracked.tolist())
    ]
    warc_ts_us = _EPOCH_US + (doc_ids % 86_400) * 1_000_000
    html = [(_HTML_PREFIX + t + _HTML_SUFFIX).encode("utf-8") for t in texts]
    return {
        "doc_id": doc_ids,
        "url": urls,
        "warc_ts_us": warc_ts_us,
        "html": html,
        "text": texts,
        "lang": lang,
    }


def _arrow_batch(cols: dict, mask: Optional[np.ndarray] = None):
    import pyarrow as pa

    if mask is not None:
        keep = np.flatnonzero(mask)
        cols = {
            k: (v[keep] if isinstance(v, np.ndarray) else [v[i] for i in keep.tolist()])
            for k, v in cols.items()
        }
    return pa.record_batch(
        [
            pa.array(cols["doc_id"], pa.int64()),
            pa.array(cols["url"], pa.string()),
            pa.array(cols["warc_ts_us"], pa.timestamp("us", tz="UTC")),
            pa.array(cols["html"], pa.binary()),
            pa.array(cols["text"], pa.string()),
            pa.array(cols["lang"], pa.string()),
        ],
        names=["doc_id", "url", "warc_ts", "html", "text", "lang"],
    )


@dataclass
class SegmentPartition(InputPartition):
    segment: int
    start_id: int
    end_id: int  # exclusive


def _parse_opts(options) -> dict:
    return {
        "rows_per_segment": int(options.get("rows_per_segment", 10_000)),
        "segments": int(options.get("segments", 8)),
        "base_doc_id": int(options.get("base_doc_id", 0)),
        "segments_per_batch": int(options.get("segments_per_batch", 0)),
        "arrow_rows": int(options.get("arrow_rows", 4096)),
    }


class CrawlReader(DataSourceReader):
    def __init__(self, options):
        self.o = _parse_opts(options)
        self.id_lo: Optional[int] = None  # inclusive, from pushed filters
        self.id_hi: Optional[int] = None  # inclusive
        self.lang_eq: Optional[str] = None

    # --- Spark 4.1 filter pushdown ------------------------------------------
    def pushFilters(self, filters: List[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("lang",) and isinstance(f.value, str):
                self.lang_eq = f.value
            elif f.attribute == ("doc_id",) and isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ):
                v = int(f.value)
                if isinstance(f, EqualTo):
                    lo, hi = v, v
                elif isinstance(f, GreaterThan):
                    lo, hi = v + 1, None
                elif isinstance(f, GreaterThanOrEqual):
                    lo, hi = v, None
                elif isinstance(f, LessThan):
                    lo, hi = None, v - 1
                else:
                    lo, hi = None, v
                if lo is not None:
                    self.id_lo = lo if self.id_lo is None else max(self.id_lo, lo)
                if hi is not None:
                    self.id_hi = hi if self.id_hi is None else min(self.id_hi, hi)
            else:
                yield f  # unsupported: Spark evaluates it post-scan

    def _segments(self) -> list[SegmentPartition]:
        o = self.o
        parts = []
        for s in range(o["segments"]):
            lo = o["base_doc_id"] + s * o["rows_per_segment"]
            hi = lo + o["rows_per_segment"]
            # plan-time segment pruning from pushed doc_id bounds
            if self.id_lo is not None and hi <= self.id_lo:
                continue
            if self.id_hi is not None and lo > self.id_hi:
                continue
            parts.append(SegmentPartition(s, lo, hi))
        return parts

    def partitions(self) -> Sequence[InputPartition]:
        return self._segments()

    def read(self, partition: SegmentPartition):
        yield from _read_segment(
            partition, self.o["arrow_rows"], self.id_lo, self.id_hi, self.lang_eq
        )


def _read_segment(
    partition: SegmentPartition,
    arrow_rows: int,
    id_lo: Optional[int],
    id_hi: Optional[int],
    lang_eq: Optional[str],
):
    """Shared executor-side generator: batch and streaming readers emit
    identical Arrow batches for the same segment (determinism under
    retry/resume)."""
    for lo in range(partition.start_id, partition.end_id, arrow_rows):
        ids = np.arange(lo, min(lo + arrow_rows, partition.end_id), dtype=np.int64)
        if id_lo is not None:
            ids = ids[ids >= id_lo]
        if id_hi is not None:
            ids = ids[ids <= id_hi]
        if ids.size == 0:
            continue
        cols = synth_pages(ids)
        mask = None
        if lang_eq is not None:
            mask = cols["lang"] == lang_eq
            if not mask.any():
                continue
        yield _arrow_batch(cols, mask)


class CrawlStreamReader(DataSourceStreamReader):
    """Micro-batch reader: each trigger takes the next
    ``segments_per_batch`` crawl segments.  Offsets are segment
    indices, so a restarted query resumes exactly where the checkpoint
    says — re-reads are byte-identical because generation is
    closed-form."""

    def __init__(self, options):
        self.o = _parse_opts(options)
        self._announced = 0

    def initialOffset(self) -> dict:
        return {"segment": 0}

    def latestOffset(self) -> dict:
        # Admission control lives HERE, not in partitions(): Spark
        # checkpoints the returned end offset as fully processed, so
        # partitions(start, end) must cover [start, end) exactly.
        # Default (segments_per_batch=0) announces the whole crawl at
        # once — required for Trigger.AvailableNow, which Spark runs as
        # a SINGLE batch for Python stream sources (no repeated polls;
        # the engine logs "does not support Trigger.AvailableNow.
        # Falling back to single batch").  A positive
        # segments_per_batch opts into incremental admission (at most
        # that many more segments per poll) for processing-time
        # triggers; a live crawl would poll the upstream segment
        # manifest here instead.
        per = self.o["segments_per_batch"]
        if per <= 0:
            self._announced = self.o["segments"]
        else:
            self._announced = min(self.o["segments"], self._announced + per)
        return {"segment": self._announced}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        o = self.o
        lo_seg, hi_seg = int(start["segment"]), int(end["segment"])
        return [
            SegmentPartition(
                s,
                o["base_doc_id"] + s * o["rows_per_segment"],
                o["base_doc_id"] + (s + 1) * o["rows_per_segment"],
            )
            for s in range(lo_seg, hi_seg)
        ]

    def read(self, partition: SegmentPartition):
        yield from _read_segment(partition, self.o["arrow_rows"], None, None, None)

    def commit(self, end: dict) -> None:
        pass


class CrawlDataSource(DataSource):
    """``spark.read.format("s2crawl")`` / ``spark.readStream.format("s2crawl")``."""

    @classmethod
    def name(cls) -> str:
        return "s2crawl"

    def schema(self) -> str:
        return (
            "doc_id bigint, url string, warc_ts timestamp, "
            "html binary, text string, lang string"
        )

    def reader(self, schema) -> CrawlReader:
        return CrawlReader(self.options)

    def streamReader(self, schema) -> CrawlStreamReader:
        return CrawlStreamReader(self.options)


# --- metrics sink -------------------------------------------------------------


@dataclass
class MetricsCommit(WriterCommitMessage):
    partition_id: int
    rows: int
    text_bytes: int
    file: str


class MetricsWriter(DataSourceWriter):
    """Per-partition metrics JSON + driver-side manifest commit.

    ``write`` runs on executors: it streams the partition once,
    accumulates (rows, text_bytes) and writes ``part-{pid}.json``.
    ``commit`` runs on the DRIVER only after every task succeeded and
    writes ``_METRICS_MANIFEST.json`` — readers of the metrics
    directory treat files not listed in a manifest as garbage from
    failed attempts, exactly like ``plans/lineage.LineageLog`` marks."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("s2metrics sink requires a path, e.g. .save('/dir')")
        self.overwrite = overwrite

    def write(self, iterator) -> MetricsCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = 0
        text_bytes = 0
        for row in iterator:
            rows += 1
            d = row.asDict()
            t = d.get("text")
            if isinstance(t, str):
                text_bytes += len(t.encode("utf-8"))
        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{pid:05d}.json"
        tmp = os.path.join(self.path, f".{fname}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"partition_id": pid, "rows": rows, "text_bytes": text_bytes}, fh)
        os.replace(tmp, os.path.join(self.path, fname))
        return MetricsCommit(pid, rows, text_bytes, fname)

    def _manifest(self, messages: List[Optional[MetricsCommit]]) -> dict:
        msgs = [m for m in messages if m is not None]
        return {
            "partitions": len(msgs),
            "rows": sum(m.rows for m in msgs),
            "text_bytes": sum(m.text_bytes for m in msgs),
            "files": sorted(m.file for m in msgs),
        }

    def commit(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        man = self._manifest(messages)
        tmp = os.path.join(self.path, "._METRICS_MANIFEST.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(man, fh, indent=1)
        os.replace(tmp, os.path.join(self.path, "_METRICS_MANIFEST.json"))

    def abort(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        # best-effort cleanup of this attempt's part files; no manifest
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.file))
                except OSError:
                    pass


class MetricsStreamWriter(MetricsWriter, DataSourceStreamWriter):
    """Streaming twin: one manifest per epoch (exactly-once per batchId
    — a replayed epoch overwrites its own manifest idempotently).

    Base order matters: ``MetricsWriter`` first so its concrete
    ``write`` satisfies ``DataSourceStreamWriter``'s abstract method."""

    def commit(self, messages: List[Optional[WriterCommitMessage]], batchId: int) -> None:
        man = self._manifest(messages)
        man["batch_id"] = batchId
        tmp = os.path.join(self.path, f"._METRICS_MANIFEST-{batchId:05d}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(man, fh, indent=1)
        os.replace(tmp, os.path.join(self.path, f"_METRICS_MANIFEST-{batchId:05d}.json"))

    def abort(self, messages: List[Optional[WriterCommitMessage]], batchId: int) -> None:
        MetricsWriter.abort(self, messages)


class MetricsDataSource(DataSource):
    """``df.write.format("s2metrics").save(path)`` — metrics-only sink."""

    @classmethod
    def name(cls) -> str:
        return "s2metrics"

    def writer(self, schema, overwrite: bool) -> MetricsWriter:
        return MetricsWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> MetricsStreamWriter:
        return MetricsStreamWriter(self.options, overwrite)


def register_crawl_sources(spark) -> None:
    """Idempotent registration of both sources on a session.

    Also enables ``spark.sql.python.filterPushdown.enabled`` — Spark
    4.1 refuses to plan a Python source whose reader implements
    ``pushFilters`` while the flag is off (fail-loud, not silent
    no-pushdown), so the flag is part of the source's contract."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CrawlDataSource)
    spark.dataSource.register(MetricsDataSource)
