"""Corpus-global duplicate-paragraph removal
(functions/paragraph_dedup.py): keep-first semantics, thresholds,
row/column preservation, and a hypothesis fuzz against the
pure-Python twin."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from s2_geometry_library_php_spark.functions.paragraph_dedup import (
    duplicate_paragraphs,
    strip_duplicate_paragraphs,
    strip_duplicate_paragraphs_py,
)

LICENSE = (
    "this text is distributed under the creative commons "
    "attribution license version four point zero"
)
UNIQUE_A = "a completely original paragraph about volcanoes and tea"
UNIQUE_B = "another original paragraph describing harbors at dusk"
SHORT = "read more"


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_keep_first_keeps_global_min_occurrence(spark):
    rows = [
        (5, f"{UNIQUE_A}\n\n{LICENSE}"),
        (2, f"{LICENSE}\n\n{UNIQUE_B}"),
        (9, LICENSE),
    ]
    out = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_paragraphs(_mkdocs(spark, rows)).collect()
    }
    # global first occurrence is (doc_id=2, pos=0)
    assert out[2] == f"{LICENSE}\n\n{UNIQUE_B}"
    assert out[5] == UNIQUE_A
    assert out[9] == ""


def test_keep_first_false_removes_all(spark):
    rows = [(1, LICENSE), (2, LICENSE), (3, UNIQUE_A)]
    out = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_paragraphs(
            _mkdocs(spark, rows), keep_first=False
        ).collect()
    }
    assert out == {1: "", 2: "", 3: UNIQUE_A}


def test_short_and_rare_paragraphs_survive(spark):
    rows = [
        (1, f"{SHORT}\n\n{UNIQUE_A}"),
        (2, f"{SHORT}\n\n{UNIQUE_B}"),
    ]
    dup = duplicate_paragraphs(_mkdocs(spark, rows))
    assert dup.count() == 0  # SHORT is under min_chars, uniques are rare
    out = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_paragraphs(_mkdocs(spark, rows)).collect()
    }
    assert out[1] == f"{SHORT}\n\n{UNIQUE_A}"
    assert out[2] == f"{SHORT}\n\n{UNIQUE_B}"


def test_min_docs_threshold_and_first_occ_columns(spark):
    rows = [(3, LICENSE), (1, f"{UNIQUE_A}\n\n{LICENSE}"), (2, LICENSE)]
    dup = duplicate_paragraphs(_mkdocs(spark, rows), min_docs=3).collect()
    assert len(dup) == 1
    assert dup[0]["para"] == LICENSE
    assert dup[0]["n_docs"] == 3
    assert (dup[0]["first_doc_id"], dup[0]["first_pos"]) == (1, 1)
    assert (
        duplicate_paragraphs(_mkdocs(spark, rows), min_docs=4).count() == 0
    )


def test_other_columns_and_row_count_preserved(spark):
    df = spark.createDataFrame(
        [(1, LICENSE, "en"), (2, LICENSE, "de")],
        "doc_id long, text string, lang string",
    )
    out = strip_duplicate_paragraphs(df)
    assert out.count() == 2
    assert sorted(out.columns) == ["doc_id", "lang", "text"]
    assert {r["lang"] for r in out.collect()} == {"en", "de"}


def test_plan_has_no_nested_loops(spark):
    df = _mkdocs(spark, [(1, LICENSE)])
    plan = (
        strip_duplicate_paragraphs(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan


# --- hypothesis fuzz vs the pure-Python twin ---------------------------------
# Tiny paragraph vocabulary forces cross-doc collisions; min_chars=5
# keeps most paragraphs eligible so keep-first logic is exercised hard.
_PARA = st.sampled_from(
    ["alpha beta gamma", "delta epsilon", "zeta", "eta theta iota kappa"]
)


@st.composite
def _doc(draw):
    n = draw(st.integers(min_value=0, max_value=5))
    return "\n\n".join(draw(_PARA) for _ in range(n))


@settings(max_examples=4, deadline=None)
@given(st.lists(_doc(), min_size=1, max_size=12))
def test_fuzz_matches_python_twin(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
            {"doc_id": "int64"}
        )
    )
    got = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_paragraphs(
            df, min_docs=2, min_chars=5
        ).collect()
    }
    want = strip_duplicate_paragraphs_py(rows, min_docs=2, min_chars=5)
    assert got == want
