"""Per-host boilerplate-line removal (functions/boilerplate.py):
crafted multi-host fixtures vs a pure-Python twin, edge cases, and
the clean_corpus wiring."""

from collections import Counter, defaultdict

import pandas as pd
import pytest

from s2_geometry_library_php_spark.functions.boilerplate import (
    boilerplate_lines,
    strip_boilerplate,
)

# Two hosts: host-a has a 3-doc site with a shared cookie banner and
# footer; host-b shares one line across 2 of 2 docs; host-c is a
# single-doc host (nothing can be boilerplate at min_docs=2).
FIXTURES = [
    (0, "https://a.example/p0", "accept cookies\nreal content zero\nfooter (c) a"),
    (1, "https://a.example/p1", "accept cookies\nreal content one\nfooter (c) a"),
    (2, "https://a.example/p2", "real content two\nfooter (c) a"),
    (3, "https://b.example/p0", "menu home about\nunique b zero"),
    (4, "https://b.example/p1", "menu home about\nunique b one\n\ntrailing"),
    (5, "https://c.example/p0", "menu home about\nsolo doc"),
    (6, "https://a.example/p3", ""),  # empty doc survives as a row
]


def twin(rows, min_docs=2, max_fraction=0.5):
    """Pure-Python twin of strip_boilerplate."""
    host_of = {
        d: u.split("://")[1].split("/")[0] for d, u, _ in rows
    }
    docs_per_host = Counter(host_of.values())
    line_docs = defaultdict(set)
    for d, _, t in rows:
        for line in set(t.split("\n")):
            if line:
                line_docs[(host_of[d], line)].add(d)
    boiler = {
        k
        for k, ds in line_docs.items()
        if len(ds) >= min_docs
        and len(ds) >= max_fraction * docs_per_host[k[0]]
    }
    out = {}
    for d, _, t in rows:
        out[d] = "\n".join(
            l for l in t.split("\n") if (host_of[d], l) not in boiler
        )
    return boiler, out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(FIXTURES, columns=["doc_id", "url", "text"])
    )


def test_boilerplate_lines_match_twin(docs):
    boiler, _ = twin(FIXTURES)
    got = {
        (r["host"], r["line"])
        for r in boilerplate_lines(docs).collect()
    }
    assert got == boiler
    # sanity on the fixture intent
    assert ("a.example", "footer (c) a") in got        # 3/4 docs
    assert ("a.example", "accept cookies") in got      # 2/4 docs, 50%
    assert ("b.example", "menu home about") in got     # 2/2 docs
    assert ("c.example", "menu home about") not in got  # single doc
    assert not any(line == "" for _, line in got)       # blanks never


def test_strip_boilerplate_matches_twin(docs):
    _, want = twin(FIXTURES)
    got = {
        r["doc_id"]: r["text"] for r in strip_boilerplate(docs).collect()
    }
    assert got == want
    # row count preserved, other columns untouched
    out = strip_boilerplate(docs)
    assert out.count() == len(FIXTURES)
    assert set(out.columns) == {"doc_id", "url", "text"}
    # line order preserved: content line stays between nothing else
    assert got[0] == "real content zero"
    assert got[4] == "unique b one\n\ntrailing"
    # single-doc host untouched
    assert got[5] == "menu home about\nsolo doc"
    # empty doc stays a row with empty text
    assert got[6] == ""


def test_strip_boilerplate_thresholds(docs):
    # min_docs=3: only the 3-doc footer qualifies on host a
    got = {
        (r["host"], r["line"])
        for r in boilerplate_lines(docs, min_docs=3).collect()
    }
    assert got == {("a.example", "footer (c) a")}
    # max_fraction=1.0: a line must be in EVERY host doc — the empty
    # doc 6 caps host a at 3/4, so nothing qualifies there
    got = {
        (r["host"], r["line"])
        for r in boilerplate_lines(docs, max_fraction=1.0).collect()
    }
    assert got == {("b.example", "menu home about")}


def test_clean_corpus_boilerplate_stage(spark):
    from s2_geometry_library_php_spark.operators.corpus_pipeline import (
        clean_corpus,
    )

    filler = "the quick brown fox is that with and of to in it so"
    df = spark.createDataFrame(
        pd.DataFrame(
            [
                (1, "https://s.example/0", f"accept cookies\n{filler} alpha"),
                (2, "https://s.example/1", f"accept cookies\n{filler} beta"),
            ],
            columns=["doc_id", "url", "text"],
        )
    )
    out = clean_corpus(
        spark,
        df,
        langs=None,
        near_dup_threshold=None,
        strip_site_boilerplate=True,
    )
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(texts) == {1, 2}
    assert all(not t.startswith("accept cookies") for t in texts.values())
    # stage runs BEFORE the quality gates: a doc that is pure
    # boilerplate is emptied and then dropped by the token gate
    df2 = spark.createDataFrame(
        pd.DataFrame(
            [
                (1, "https://s.example/0", f"accept cookies\n{filler} alpha"),
                (2, "https://s.example/1", f"accept cookies\n{filler} beta"),
                (3, "https://s.example/2", "accept cookies"),
            ],
            columns=["doc_id", "url", "text"],
        )
    )
    out2 = clean_corpus(
        spark,
        df2,
        langs=None,
        near_dup_threshold=None,
        strip_site_boilerplate=True,
    )
    assert {r["doc_id"] for r in out2.select("doc_id").collect()} == {1, 2}


def test_uppercase_scheme_hosts_not_merged(spark):
    """Scheme matching must be case-insensitive: with a lowercase-only
    pattern 'HTTP://x.example' and 'HTTPS://y.example' both extract
    host '' and their shared line would wrongly count as one host's
    boilerplate across different sites."""
    rows = [
        (0, "HTTP://x.example/p0", "menu shared line\nx zero"),
        (1, "HTTPS://y.example/p0", "menu shared line\ny zero"),
        (2, "http://x.example/p1", "menu shared line\nx one"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "url", "text"])
    )
    boiler = boilerplate_lines(df).collect()
    # x.example sees the line in 2/2 docs (case-insensitive scheme,
    # lowercased host) -> boilerplate; y.example has 1 doc -> nothing
    assert {(r["host"], r["line"]) for r in boiler} == {
        ("x.example", "menu shared line")
    }
    out = {r["doc_id"]: r["text"] for r in strip_boilerplate(df).collect()}
    assert out[0] == "x zero" and out[2] == "x one"
    assert out[1] == "menu shared line\ny zero"


def test_query_string_not_part_of_host(spark):
    """'http://x.example?a=1' and 'http://x.example/p' are the SAME
    host (the capture must stop at '?'/'#'), matching the
    urltools/hostcap host rule used by the rest of the pipeline."""
    rows = [
        (0, "http://x.example?a=1", "menu shared line\nq zero"),
        (1, "http://x.example/p1", "menu shared line\nq one"),
        (2, "http://x.example/p2#frag", "menu shared line\nq two"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "url", "text"])
    )
    boiler = {(r["host"], r["line"]) for r in boilerplate_lines(df).collect()}
    assert boiler == {("x.example", "menu shared line")}
