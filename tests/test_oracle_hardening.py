"""Driver-parity hardening of the local oracle harness (VERDICT r5 #2, #10).

Two layers close the HUGEINT/int-vs-float bug class for good:

1. ``normalize``/``compare`` must treat an integer-typed Spark column vs a
   float-typed oracle column as a MISMATCH (the driver hashes canonical
   string renderings, so ``26000000000000`` != ``2.6e13`` there even though
   Python's ``==`` says otherwise — exactly how ``jl_projection_topk``
   passed locally and failed at the driver in round 5).
2. A registry-wide DuckDB type audit: no oracle may output a HUGEINT /
   UHUGEINT / DECIMAL column — those render as float64 (or object) through
   ``fetchdf`` and can silently hash-mismatch an integer Spark column.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from tests.oracle_harness import _norm_cell, normalize
from unstructured_data_pipeline_spark import queries as Q
from unstructured_data_pipeline_spark.schemas import FIXTURE_TABLES

SF_DIR = "/root/testdata/sf0.001"


def test_int_vs_float_cells_do_not_compare_equal():
    # The exact round-5 failure shape: Spark emitted BIGINT 26000000000000,
    # DuckDB's HUGEINT came back through fetchdf as float 2.6e13.
    assert _norm_cell(26000000000000) != _norm_cell(2.6e13)
    assert _norm_cell(0) != _norm_cell(0.0)
    assert _norm_cell(1) != _norm_cell(True)  # bool is not int either


def test_float_float_and_int_int_still_match():
    assert _norm_cell(2.6e13) == _norm_cell(26000000000000.0)
    assert _norm_cell(0.1 + 0.2) == _norm_cell(0.30000000000000004)  # 9-dp round
    assert _norm_cell(7) == _norm_cell(7)
    assert _norm_cell(None) is None


def test_normalize_flags_dtype_kind_mismatch_between_frames():
    ints = pd.DataFrame({"k": [1, 2], "v": pd.array([100, 200], dtype="int64")})
    floats = pd.DataFrame({"k": [1, 2], "v": pd.array([100.0, 200.0], dtype="float64")})
    _, irows = normalize(ints)
    _, frows = normalize(floats)
    assert irows != frows, "int64 vs float64 columns must not normalize equal"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="fixture data absent")
def test_no_oracle_outputs_hugeint_or_decimal():
    """DESCRIBE every registry oracle through DuckDB and reject any output
    column whose type fetchdf would render as float/object while Spark
    emits an integer — the round-5 ``jl_projection_topk`` bug class."""
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    banned = ("HUGEINT", "UHUGEINT", "DECIMAL")
    offenders = []
    for name, sql in Q.oracle_sql().items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # a DESCRIBE failure is itself a finding
            offenders.append((name, "<describe failed>", str(e)[:120]))
            continue
        for col, ctype, *_ in desc:
            if any(b in str(ctype).upper() for b in banned):
                offenders.append((name, col, ctype))
    assert not offenders, f"oracles with unsafe output column types: {offenders}"


# ---------------------------------------------------------------------------
# Registry-duplication audit (VERDICT r7 Next #4): round 7's
# `unpivot_part_metrics` incident re-bound an existing `*_SQL` oracle
# constant, silently clobbering ANOTHER entry's oracle; the full sweep
# caught it after the fact — these close the bug class before any sweep.

# Entries that INTENTIONALLY share one oracle: two independent Spark
# implementations hash-gated against the same SQL.  Any other sharing is
# a clobbered/copy-pasted oracle.
TWIN_GROUPS = {
    frozenset({"history_documents_current", "history_documents_sparksql"}),
    frozenset({"dedup_ngram_jaccard", "dedup_ngram_jaccard_prefix"}),
    frozenset({"variant_props_extract", "variant_native_extract"}),
}


def test_no_two_registry_entries_share_a_function_object():
    seen: dict[int, str] = {}
    for name, (fn, _) in Q.REGISTRY.items():
        assert id(fn) not in seen, (
            f"{name} and {seen[id(fn)]} are bound to the SAME query function"
        )
        seen[id(fn)] = name


def test_oracle_sql_sharing_is_exactly_the_declared_twins():
    by_sql: dict[str, list[str]] = {}
    for name, (_, sql) in Q.REGISTRY.items():
        if sql is not None:
            by_sql.setdefault(sql, []).append(name)
    groups = {frozenset(v) for v in by_sql.values() if len(v) > 1}
    assert groups == TWIN_GROUPS, (
        f"unexpected oracle sharing: {sorted(map(sorted, groups ^ TWIN_GROUPS))}"
    )


def test_no_sql_constant_is_assigned_twice_at_module_top_level():
    """The exact `unpivot_part_metrics` failure shape: a second top-level
    `FOO_SQL = ...` assignment silently replaces the first, so the OLDER
    entry's oracle changes without its code changing.  Parse the module
    source and reject any repeated top-level *_SQL binding."""
    import ast
    import collections
    import inspect

    tree = ast.parse(inspect.getsource(Q))
    counts = collections.Counter()
    for node in tree.body:
        targets = []
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
            targets = [node.target]
        for t in targets:
            if isinstance(t, ast.Name) and t.id.endswith("_SQL"):
                counts[t.id] += 1
    rebound = {k: v for k, v in counts.items() if v > 1}
    assert not rebound, f"*_SQL constants assigned more than once: {rebound}"


def test_every_public_sql_constant_is_bound_to_a_registry_entry():
    """A public *_SQL constant no registry entry references is either dead
    code or evidence an entry lost its oracle (the other half of the
    clobber incident).  Private `_*_SQL` building blocks are composed into
    larger oracles via f-strings and are exempt."""
    registry_sqls = {sql for _, sql in Q.REGISTRY.values() if sql is not None}
    orphans = [
        k
        for k, v in vars(Q).items()
        if k.endswith("_SQL")
        and not k.startswith("_")
        and isinstance(v, str)
        and v not in registry_sqls
    ]
    assert not orphans, f"public *_SQL constants unused by the registry: {orphans}"
