"""Hypothesis fuzz: the PII redaction twins (functions/pii.py) are
byte-identical between Spark's Java regex engine and DuckDB's RE2 on
adversarial input — the property the driver oracle and the module's
"common regex subset" claim rest on.

Strategy: generate strings over an alphabet dense in the characters
the patterns care about (digits, '@', '.', '+', '-', spaces, letters,
a few unicode confusables), plus structured near-PII fragments, then
run ONE batched DataFrame through Spark and the same rows through
DuckDB and compare redacted text and all three counts exactly.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from s2_geometry_library_php_spark.functions.pii import (
    pii_count_columns,
    pii_count_duckdb,
    redact_pii_column,
    redact_pii_duckdb,
)

# fragments that sit right on the pattern boundaries
FRAGMENTS = st.sampled_from(
    [
        "a@b.co",
        "a@b",               # no TLD — not an email
        "@b.co",             # no local part
        "x.y%z+w@host.io",
        "1.2.3.4",
        "1.2.3.4.5",         # 5-part dotted run: not an IPv4, survives
        "999.999.999.999",   # syntactically an IPv4 per the rule
        "1.2.3",             # 3 octets — not an IP
        "555-123-4567",
        "555 1234 4567",
        "55-123-4567",       # 2-digit head — no match
        "+4915112345678",
        "+123456",           # 6 digits — too short for E.164 rule
        "12345678901234567890",  # bare run — never redacted
        "v1.2.3",
        "3.14159",
        "٣٤٥",               # arabic-indic digits: NOT \\d in either engine
        "ｅｍａｉｌ＠ｈｏｓｔ．ｃｏｍ",  # fullwidth confusables
    ]
)

NOISE = st.text(
    alphabet="0123456789@.+- abZé \U0001f600",
    min_size=0,
    max_size=12,
)

DOC = st.lists(
    st.one_of(FRAGMENTS, NOISE), min_size=0, max_size=6
).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=40))
def test_redaction_engine_parity_fuzz(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i long, text string")
    out = df.select(
        "i",
        redact_pii_column("text").alias("red"),
        *[c.alias(n) for n, c in pii_count_columns("text").items()],
    )
    got = {
        r["i"]: (r["red"], r["n_email"], r["n_ipv4"], r["n_phone"])
        for r in out.collect()
    }
    con = duckdb.connect()
    twins = pii_count_duckdb("text")
    want = {}
    for i, t in rows:
        red, ne, ni, np_ = con.execute(
            f"SELECT {redact_pii_duckdb('text')}, {twins['n_email']}, "
            f"{twins['n_ipv4']}, {twins['n_phone']} "
            f"FROM (SELECT ? AS text)",
            [t],
        ).fetchone()
        want[i] = (red, ne, ni, np_)
    assert got == want
