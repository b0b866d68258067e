"""Hypothesis property-based tests for the pure-Python layers
(parser, algebra validation, sql introspection, datamodel) — fast, no
Spark session."""

from hypothesis import given, settings, strategies as st

from graphdb_spark import algebra as A
from graphdb_spark.algebra import Q
from graphdb_spark.cypher.parser import (
    CypherSyntaxError,
    parse_cypher,
    parse_statement,
    tokenize,
)
from graphdb_spark.datamodel import (
    InvalidIdentifierError,
    normalize_properties,
    validate_identifier,
)
from graphdb_spark.sql_compat import parse_statement_info

ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,30}", fullmatch=True)
safe_str = st.text(
    alphabet=st.characters(blacklist_characters="'\"\\\x00", min_codepoint=32),
    max_size=20,
)


@given(ident, st.dictionaries(ident, st.one_of(
    st.integers(min_value=-10**9, max_value=10**9),
    st.booleans(),
    safe_str,
), max_size=5))
@settings(max_examples=200, deadline=None)
def test_create_roundtrip_parses(label, props):
    """Any CREATE with generated identifiers/properties parses and
    preserves labels + property keys."""
    import json

    parts = []
    for k, v in props.items():
        if isinstance(v, bool):
            parts.append(f"{k}: {'true' if v else 'false'}")
        elif isinstance(v, int):
            parts.append(f"{k}: {v}")
        else:
            parts.append(f"{k}: {json.dumps(v)}")
    q = f"CREATE (n:{label} {{{', '.join(parts)}}})"
    stmt = parse_statement(q)
    node = stmt.clauses[0].patterns[0].nodes[0]
    # keywords double as identifiers, casing preserved except KW uppercase
    assert node.labels[0].upper() == label.upper()
    assert {k.upper() for k in node.properties} == {k.upper() for k in props}


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_parser_never_crashes_unexpectedly(s):
    """Arbitrary input either parses or raises CypherSyntaxError —
    never any other exception type."""
    try:
        parse_cypher(s)
    except CypherSyntaxError:
        pass
    except RecursionError:
        raise AssertionError("parser recursion blowup")


@given(st.text(alphabet="()[]{}:,.<>=-|&*'\"MATCHRETURNWHERE ", max_size=40))
@settings(max_examples=300, deadline=None)
def test_tokenizer_total(s):
    """Tokenizer is total over its alphabet or raises CypherSyntaxError."""
    try:
        toks = tokenize(s)
        assert toks[-1].kind == "eof"
    except CypherSyntaxError:
        pass


@given(st.text(min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_identifier_validation_matches_byte_length(s):
    n = len(s.encode("utf-8"))
    if 1 <= n <= 255:
        assert validate_identifier(s) == s
    else:
        try:
            validate_identifier(s)
            raise AssertionError("expected InvalidIdentifierError")
        except InvalidIdentifierError:
            pass


@given(st.integers(min_value=0, max_value=6))
@settings(max_examples=50, deadline=None)
def test_include_output_len_invariant(n_includes):
    """output_len == number of Includes + 1 for any chain
    (queries.rs:129-147)."""
    q = Q.vertices()
    for _ in range(n_includes):
        q = q.include().outbound().inbound()
    assert q.output_len() == n_includes + 1


@given(st.sampled_from(["properties", "outbound", "inbound", "with_property"]))
@settings(max_examples=20, deadline=None)
def test_count_terminality_invariant(op):
    """Counts cannot be piped or property-queried; note count(count)
    IS allowed — CountQuery::new accepts any valid inner
    (queries.rs:668-675)."""
    c = Q.vertices().count()
    try:
        fn = getattr(c, op)
        fn("x") if op == "with_property" else fn()
        raise AssertionError("Count must be terminal for pipes")
    except A.OperationOnQueryError:
        pass
    # count-of-count allowed, like the reference
    assert c.count().output_type() == A.OutputType.COUNT


@given(ident, st.lists(ident, min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_sql_introspection_select(table, cols):
    sql = f"SELECT {', '.join(cols)} FROM {table}"
    info = parse_statement_info(sql)
    assert info.kind == "select"
    assert info.table_name == table
    assert set(info.columns) == set(c.split(".")[-1] for c in cols)


@given(st.dictionaries(ident, st.one_of(st.integers(), st.booleans(), safe_str),
                       max_size=5))
@settings(max_examples=100, deadline=None)
def test_normalize_properties_stringifies(props):
    out = normalize_properties(props)
    assert set(out) == set(props)
    for k, v in props.items():
        if isinstance(v, bool):
            assert out[k] == ("true" if v else "false")
        else:
            assert out[k] == str(v)


def test_value_histogram_partitions_the_table(spark):
    """Histogram bins must partition lineitem exactly: counts sum to
    the row count, bins are within range, and lower edges increase."""
    from graphdb_spark.sources.tpch import load_tables
    from graphdb_spark.workloads.relational import HIST_BINS, value_histogram

    sf = "/root/testdata/sf0.001"
    rows = value_histogram(spark, sf).collect()
    total = load_tables(spark, sf)["lineitem"].count()
    assert sum(r["n"] for r in rows) == total
    assert all(0 <= r["bin"] < HIST_BINS for r in rows)
    los = [r["lo"] for r in rows]
    assert los == sorted(los)
