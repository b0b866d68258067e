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


def test_dq_checks_detect_injected_violations(spark):
    """dq_checks on clean-by-construction constraints is zero; the
    ship-before-order probe is NONZERO on the driver's synthetic data
    (its generator draws ship dates independent of order dates) — the
    report distinguishes real violations from clean constraints rather
    than printing zeros for everything."""
    from graphdb_spark.workloads.relational import dq_checks

    rows = {r["chk"]: r["violations"]
            for r in dq_checks(spark, "/root/testdata/sf0.001").collect()}
    assert rows["orders_null_custkey"] == 0
    assert rows["orders_dup_orderkey"] == 0
    assert rows["lineitem_orphan_orderkey"] == 0
    assert rows["orders_orphan_custkey"] == 0
    assert rows["lineitem_ship_before_order"] > 0
    assert len(rows) == 6


def test_window_analytics_distribution_bounds(spark):
    """percent_rank in [0,1] starting at 0; cume_dist in (0,1];
    second_key is NULL for rn=1 and constant per segment for rn>=2."""
    from graphdb_spark.workloads.relational import window_analytics

    rows = window_analytics(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["c_mktsegment"], []).append(r)
    for seg, rs in by_seg.items():
        rs.sort(key=lambda r: r["rn"])
        assert rs[0]["pct_rank"] == 0.0
        assert rs[0]["second_key"] is None
        second = {r["second_key"] for r in rs if r["rn"] >= 2}
        assert len(second) == 1
        for a, b in zip(rs, rs[1:]):
            assert a["pct_rank"] < b["pct_rank"]
            assert a["cume"] <= b["cume"] <= 1.0


def test_numeric_profile_is_a_correlation(spark):
    """corr values in [-1, 1]; price-qty is NEAR ZERO on the driver's
    synthetic data (unlike real TPC-H, where extendedprice = qty x
    unit price, this generator draws them independently — the same
    independence dq_checks catches on ship dates); means match a
    direct aggregate."""
    from pyspark.sql import functions as F

    from graphdb_spark.sources.tpch import load_tables
    from graphdb_spark.workloads.relational import numeric_profile

    sf = "/root/testdata/sf0.001"
    rows = {(r["x"], r["y"]): r for r in numeric_profile(spark, sf).collect()}
    assert len(rows) == 6
    for r in rows.values():
        assert -1.0 <= r["corr"] <= 1.0
    assert abs(rows[("qty", "price")]["corr"]) < 0.1
    li = load_tables(spark, sf)["lineitem"]
    direct = li.agg(F.avg("l_quantity")).collect()[0][0]
    assert abs(rows[("qty", "price")]["mean_x"] - direct) < 1e-4
