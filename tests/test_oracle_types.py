"""Registry-wide oracle OUTPUT-TYPE lint.

The driver's value-hash is TYPE-SENSITIVE: an oracle column whose DuckDB
type serializes differently from the Spark-side type fails the driver's
hash even when every value is bit-exact, while every local layer
(harness, walk simulations, registered-pair tests) canonicalizes to
Python values and is structurally blind to it. Round 9's only red row
was exactly this class: events_kaplan_meier's uncasted window
``sum(BIGINT)`` came back HUGEINT (int128) — the registry's single
int128 output column — vs Spark's int64 (rows and schema matched, hash
failed). DuckDB rules that make this easy to trip:

- ``sum(INTEGER/BIGINT)`` (plain AND windowed) returns HUGEINT;
- integer ``avg``-free arithmetic on a HUGEINT stays HUGEINT;
- decimal literals / ``round(DECIMAL, n)`` can return DECIMAL, which
  pandas materializes as ``decimal.Decimal`` objects.

The fix is always a one-line ``CAST(... AS BIGINT/DOUBLE)`` at the
output (or on the offending intermediate). This lint sweeps EVERY
registered oracle through DuckDB's binder (planning only — nothing
executes) and fails with the offending column list, so the class can
never again pass local verification. The same check runs inside
tests/oracle_harness.py's per-query compare (banned_oracle_types).

Since the r10 review the check is an ALLOWLIST of driver-green-proven
type ids with container recursion, not a blacklist of observed
failures: ubigint (DuckDB hash()), float32, time/interval/blob are
flagged too until some oracle proves them hash-safe, and a HUGEINT
nested inside a STRUCT/LIST is caught while struct field NAMES are
never inspected.
"""

from data_pipeline_eng_project_1_spark.plans import queries as Q

from tests.oracle_harness import banned_oracle_types, duck_connection

SF = "/root/testdata/sf0.001"


def test_no_typed_hash_unsafe_oracle_output_columns():
    con = duck_connection(SF)
    offenders = {}
    for spec in Q.specs():
        if spec.oracle is None:
            continue
        bad = banned_oracle_types(con, spec.oracle)
        if bad:
            offenders[spec.name] = bad
    assert not offenders, (
        f"oracle output columns outside the driver-green-proven type "
        f"allowlist (tests/oracle_harness._SAFE_DUCK_TYPE_IDS) — the "
        f"driver's typed value-hash will fail them even on bit-exact "
        f"values; CAST the expressions to a proven type: {offenders}")


def test_lint_actually_detects_the_kaplan_class():
    """The lint must flag the exact expression shape that slipped
    through in r9 (an uncasted windowed integer sum) — guards against
    the lint itself regressing into a no-op."""
    con = duck_connection(SF)
    uncasted = """
    SELECT o_custkey,
           sum(o_orderkey) OVER (ORDER BY o_custkey) AS running
    FROM orders LIMIT 5
    """
    bad = banned_oracle_types(con, uncasted)
    assert bad and "running" in bad[0] and "HUGEINT" in bad[0].upper()
    casted = uncasted.replace("sum(o_orderkey) OVER (ORDER BY o_custkey)",
                              "CAST(sum(o_orderkey) OVER (ORDER BY "
                              "o_custkey) AS BIGINT)")
    assert banned_oracle_types(con, casted) == []
    decimal_out = "SELECT round(CAST(1.5 AS DECIMAL(10, 2)), 1) AS d"
    assert banned_oracle_types(con, decimal_out)
    # nested inside a STRUCT or LIST is the same driver-hash hazard —
    # a type-string PREFIX check would miss both of these
    nested = ("SELECT {'cnt': sum(o_orderkey) OVER ()} AS s "
              "FROM orders LIMIT 1")
    assert banned_oracle_types(con, nested)
    listed = ("SELECT [sum(o_orderkey) OVER ()] AS l "
              "FROM orders LIMIT 1")
    assert banned_oracle_types(con, listed)
    # ...but a struct FIELD merely NAMED like a banned type is fine
    named = "SELECT {'decimal_x': 1} AS s"
    assert banned_oracle_types(con, named) == []
    # allowlist form: classes the old blacklist silently admitted
    assert banned_oracle_types(con, "SELECT hash(1) AS h")      # UBIGINT
    assert banned_oracle_types(con, "SELECT CAST(1.5 AS FLOAT) AS f")
    assert banned_oracle_types(con, "SELECT INTERVAL 1 DAY AS i")
    # ...while the proven-green uinteger (regr_count) stays legal
    assert banned_oracle_types(
        con, "SELECT regr_count(o_totalprice, o_custkey) AS n "
             "FROM orders") == []


def test_banked_spec_oracles_pass_the_type_lint_too():
    """The banked (not-yet-registered) oracle constants in the
    tests/test_r1*_oracle_specs.py files go through the SAME binder
    lint as registered oracles, so a HUGEINT/DECIMAL output hazard
    surfaces at BANKING time — not on registration day when the walk
    budget is already committed. Discovers every module-level
    *_SQL string in the current bank spec files dynamically."""
    import importlib
    import pathlib

    con = duck_connection(SF)
    here = pathlib.Path(__file__).parent
    offenders = {}
    checked = 0
    # only files whose pairs are still PRE-registration hold bare
    # *_SQL constants that compare_df_vs_sql reads; registered-era
    # spec files re-point at the registry and keep no constants
    for p in sorted(here.glob("test_r*_oracle_specs.py")):
        mod = importlib.import_module(f"tests.{p.stem}")
        for name in dir(mod):
            if not name.endswith("_SQL"):
                continue
            sql = getattr(mod, name)
            if not isinstance(sql, str) or "SELECT" not in sql:
                continue
            checked += 1
            bad = banned_oracle_types(con, sql)
            if bad:
                offenders[f"{p.stem}.{name}"] = bad
    assert not offenders, (
        f"banked spec oracles with hash-unsafe output types: "
        f"{offenders}")
    assert checked >= 4  # the r17 + r18 banks today
