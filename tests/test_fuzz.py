"""Property-based fuzzing — parser robustness + analyzer/SQL equivalence."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from toshi_ray.analyzer import DefaultAnalyzer
from toshi_ray.query import QueryError, parse_query

# --- the query parser never crashes with anything but QueryError ---

json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-(2**40), 2**40),
    st.floats(allow_nan=False, allow_infinity=False), st.text(max_size=20),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=10), children, max_size=4),
    ),
    max_leaves=12,
)


@given(json_values)
@settings(max_examples=300, deadline=None)
def test_parse_query_total(obj):
    try:
        parse_query(obj)
    except QueryError:
        pass  # the only acceptable failure mode


@given(st.dictionaries(st.sampled_from(
    ["term", "phrase", "fuzzy", "regex", "range", "bool", "raw", "all"]),
    json_values, min_size=1, max_size=1))
@settings(max_examples=300, deadline=None)
def test_parse_query_known_kinds_total(obj):
    try:
        parse_query(obj)
    except QueryError:
        pass


# --- analyzer ≡ the SQL oracle tokenization on ASCII text ---

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=120
)


@given(st.lists(ascii_text, min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_analyzer_matches_duckdb_tokenization(texts):
    import pyarrow as pa

    an = DefaultAnalyzer()
    tc = an.tokenize_column(pa.array(texts, type=pa.string()))
    per_doc = [[] for _ in texts]
    for t, d in zip(tc.terms.to_pylist(), tc.doc_index):
        per_doc[d].append(t)

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    rows = con.execute(
        "SELECT i, list_filter(regexp_split_to_array(lower(s), '[^a-z0-9]+'),"
        " x -> length(x) > 0 AND strlen(x) < 40) FROM t ORDER BY i"
    ).fetchall()
    want = [r[1] for r in rows]
    assert per_doc == want
