"""Oracle output-type tripwire (VERDICT r3 ask #2).

The driver's correctness hash is type-sensitive; DuckDB's uncast
``SUM(BIGINT)`` yields HUGEINT and hash-mismatches a value-equal Spark
BIGINT.  This suite (a) proves the tripwire catches that exact pattern
— the root cause of the four r3 driver FAILs — and (b) sweeps every
registered oracle so no new uncast-SUM landmine can merge.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, ".")

from tools.oracle_types import (  # noqa: E402
    offending_types,
    oracle_output_types,
    sweep,
    views_connection,
)


@pytest.fixture(scope="module")
def con():
    c = views_connection()
    yield c
    c.close()


def test_uncast_sum_is_flagged(con):
    """The r3 failure pattern: uncast SUM over a BIGINT produces
    HUGEINT and must be flagged as an offender."""
    pairs = oracle_output_types(
        "SELECT doc_id, SUM(doc_id) AS s FROM documents GROUP BY doc_id", con
    )
    types = [t for _, t in pairs]
    assert "HUGEINT" in types
    assert offending_types(types) == ["HUGEINT"]


def test_cast_sum_is_clean(con):
    pairs = oracle_output_types(
        "SELECT CAST(SUM(doc_id) AS BIGINT) AS s FROM documents", con
    )
    assert offending_types([t for _, t in pairs]) == []


def test_nested_offender_is_flagged():
    assert offending_types(["STRUCT(a HUGEINT, b VARCHAR)"]) == ["HUGEINT"]
    assert offending_types(["HUGEINT[]"]) == ["HUGEINT"]
    assert offending_types(["UBIGINT"]) == ["UBIGINT"]


def test_approved_types_pass():
    assert (
        offending_types(
            ["BIGINT", "DOUBLE", "DECIMAL(18,6)", "VARCHAR", "DATE",
             "TIMESTAMP", "BOOLEAN", "FLOAT[]", "STRUCT(x BIGINT)"]
        )
        == []
    )


def test_pre_fix_r3_patterns_are_caught(con):
    """Each of the four r3 driver-FAIL oracles' pre-fix expression
    shapes, reduced to their essence, must trip the wire — this test
    fails on any of them if the CAST is ever removed again."""
    shapes = {
        "ti_obv": "SELECT SUM(doc_id) OVER (ORDER BY doc_id) AS obv FROM documents",
        "t_word_entropy": "SELECT source, SUM(n_chars) AS n FROM documents GROUP BY source",
        "t_bpe_merges": "SELECT SUM(n_chars) AS pair_count FROM documents",
        "t_countmin_hh": "SELECT doc_id % 4 AS r, SUM(n_chars) AS cell FROM documents GROUP BY 1",
    }
    for name, sql in shapes.items():
        types = [t for _, t in oracle_output_types(sql, con)]
        assert "HUGEINT" in offending_types(types), name


def test_uppercase_struct_alias_not_flagged(con):
    """A quoted uppercase struct-field alias renders as ``N BIGINT`` in
    the type string; the structural walk must not mistake the alias for
    a pseudo-type (the r4 ADVICE false-positive)."""
    types = list(con.sql('SELECT {\'N\': 1::BIGINT, \'FOO BAR\': 2::BIGINT} AS s').types)
    assert offending_types(types) == []
    # ...while a real nested offender still trips structurally.
    types = list(con.sql("SELECT {'N': 1::HUGEINT} AS s").types)
    assert offending_types(types) == ["HUGEINT"]


def test_full_registry_sweep_clean():
    """Every oracle in the live registry binds cleanly and emits only
    hash-safe output types.  This is the standing gate: a new oracle
    with an uncast SUM fails here before the driver ever hashes it."""
    import __spark_entry__ as entrymod

    bad = sweep(entrymod.oracle_sql())
    assert bad == {}, f"hash-unsafe oracle output types: {bad}"
