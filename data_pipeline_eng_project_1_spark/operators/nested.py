"""Nested / array operators for the flashscore match schema.

Every pandas ``.apply(lambda …)`` in the reference becomes native Spark
column algebra here — zero Python UDFs, so the whole transform stays inside
whole-stage codegen and scales linearly with partitions.

Reference operators re-expressed (SURVEY.md §2.4):
- struct field pluck             dags/utils.py:158-159
- array<struct> field extraction dags/utils.py:161-162
- pad-or-null arity guard        dags/utils.py:164-165
- fixed-arity array → columns    dags/utils.py:324-343 (positional INSERT)
- find-by-key probe (odds)       get_odd_value, dags/utils.py:226-235
- 8×3 odds widening              process_row_odd, dags/utils.py:237-250

r17 form: every helper emits SQL TEXT consumed by one ``selectExpr`` per
transform instead of per-column ``pyspark.sql.functions`` Column objects.
The expressions (and therefore the computed values) are identical — the
change is purely driver-side: the r7-r16 Column form cost one py4j
round-trip per node, ~700 round-trips ≈ 1.5-2 s of pure plan-build time
per flashscore_format_parity run (the similarity_ann_ivf r6 lesson,
measured again here: builder 2.1 s vs 0.5 s of execution); a batched
selectExpr is one round-trip per projection.
"""

from __future__ import annotations

#: The eight bookmaker probe keys hard-coded in process_row_odd
#: (dags/utils.py:240-248), in output order. These are data constants of the
#: pipeline's contract, not code.
BOOKMAKERS = (
    "Betclic.fr", "Unibet.fr", "bwin.fr", "France Pari",
    "NetBet.fr", "Winamax", "bet365", "1xBet",
)

#: SQL-identifier-safe column prefixes for the ODDS table
#: (dags/utils.py:263-287: FRANCE_PARIS, ONEBET spellings).
BOOKMAKER_COLS = (
    "BETCLIC", "UNIBET", "BWIN", "FRANCE_PARIS",
    "NETBET", "WINAMAX", "BET365", "ONEBET",
)

ODDS_SIDES = ("HOME", "NIL", "AWAY")

LINEUP_SIZE = 11


def team_names_sql(lineups: str, team: str) -> str:
    """SQL: pluck player names from <lineups>.<Team>: array<struct{name}>
    → array<string> (reference: per-row list comprehension,
    dags/utils.py:161-162)."""
    return f"{lineups}.{team}.name"


def pad_or_null_sql(names: str, size: int = LINEUP_SIZE) -> str:
    """SQL arity guard: keep the array only when it has exactly ``size``
    entries, else null (reference replaces with [None]*11,
    dags/utils.py:164-165; all-null rows are then skipped at load,
    :341-342). Null (vs a null-filled array) lets downstream use a single
    IS NOT NULL filter."""
    return f"CASE WHEN size({names}) = {size} THEN {names} END"


def array_to_columns_sql(names: str, prefix: str,
                         size: int = LINEUP_SIZE) -> list[str]:
    """SQL: fixed-arity array → SIZE columns `<prefix>_1..SIZE` (reference
    does this implicitly via positional INSERT params,
    dags/utils.py:324-337)."""
    return [f"element_at({names}, {i + 1}) AS {prefix}_{i + 1}"
            for i in range(size)]


def find_odds_by_bookmaker_sql(bookmakers: str, name: str) -> str:
    """SQL: probe <bookmakers> for one bookmaker's odds triple.

    Semantics of get_odd_value (dags/utils.py:226-235): first entry whose
    ``bookmaker`` matches → its odds cast to double, but only when the
    odds array has exactly 3 entries; missing bookmaker or malformed
    arity → null (→ three null columns after widening).

    try_element_at: missing bookmaker -> empty filtered array -> null
    (element_at on index 1 of an empty array throws under ANSI mode).
    try_cast: a non-numeric odd string → null — the reference's bare
    float() (dags/utils.py:234) would crash the whole run on one bad
    value; a null cell is the deliberate hardening here.
    """
    entry = (f"try_element_at(filter({bookmakers}, "
             f"b -> b.bookmaker = '{name}'), 1)")
    return (f"transform(CASE WHEN size({entry}.odds) = 3 "
            f"THEN {entry}.odds END, o -> try_cast(o AS DOUBLE))")


def widen_odds_sql(bookmakers: str) -> tuple[list[str], list[str]]:
    """8 bookmakers × {HOME,NIL,AWAY} → 24 double columns
    (reference: process_row_odd, dags/utils.py:237-250 + INSERT column
    list at :263-287). Returns (triple_exprs, widen_exprs) for TWO
    stacked projections: the probes once per bookmaker, then the
    element_at fan-out — same shape the Column form planned."""
    triples = [
        f"{find_odds_by_bookmaker_sql(bookmakers, probe)} AS __t_{col}"
        for probe, col in zip(BOOKMAKERS, BOOKMAKER_COLS)
    ]
    widened = [
        f"element_at(__t_{col}, {i + 1}) AS {col}_{side}_ODD"
        for col in BOOKMAKER_COLS
        for i, side in enumerate(ODDS_SIDES)
    ]
    return triples, widened
