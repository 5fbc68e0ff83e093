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
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

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


def team_names(lineups: Column, team: str) -> Column:
    """Pluck player names from lineups_data.<Team>: array<struct{name}> →
    array<string> (reference: per-row list comprehension, dags/utils.py:161-162)."""
    return lineups.getField(team).getField("name")


def pad_or_null(names: Column, size: int = LINEUP_SIZE) -> Column:
    """Arity guard: keep the array only when it has exactly `size` entries,
    else null (reference replaces with [None]*11, dags/utils.py:164-165;
    all-null rows are then skipped at load, :341-342). Null (vs a null-filled
    array) lets downstream use a single isNotNull filter."""
    return F.when(F.size(names) == size, names)


def array_to_columns(names: Column, prefix: str, size: int = LINEUP_SIZE) -> list[Column]:
    """Fixed-arity array → SIZE columns `<prefix>_1..SIZE` (reference does
    this implicitly via positional INSERT params, dags/utils.py:324-337)."""
    return [
        F.element_at(names, i + 1).alias(f"{prefix}_{i + 1}")
        for i in range(size)
    ]


def find_odds_by_bookmaker(bookmakers: Column, name: str) -> Column:
    """Probe bookmakers_data for one bookmaker's odds triple.

    Semantics of get_odd_value (dags/utils.py:226-235): first entry whose
    ``bookmaker`` matches → its odds cast to float, but only when the odds
    array has exactly 3 entries; missing bookmaker or malformed arity → null
    (→ three null columns after widening).
    """
    # try_element_at: missing bookmaker -> empty filtered array -> null
    # (element_at on index 1 of an empty array throws under ANSI mode).
    entry = F.try_element_at(
        F.filter(bookmakers, lambda b: b.getField("bookmaker") == F.lit(name)),
        F.lit(1),
    )
    odds = entry.getField("odds")
    valid = F.when(F.size(odds) == 3, odds)
    # try_cast: non-numeric odd string → null. The reference's bare float()
    # (dags/utils.py:234) would crash the whole run on one bad value; a null
    # cell is the deliberate hardening here.
    return F.transform(valid, lambda o: o.try_cast("double"))


def widen_odds(bookmakers: Column) -> list[Column]:
    """8 bookmakers × {HOME,NIL,AWAY} → 24 double columns
    (reference: process_row_odd, dags/utils.py:237-250 + INSERT column list
    at :263-287). Pure loop-generated column algebra — one projection node."""
    cols: list[Column] = []
    for probe_name, col_name in zip(BOOKMAKERS, BOOKMAKER_COLS):
        triple = find_odds_by_bookmaker(bookmakers, probe_name)
        for i, side in enumerate(ODDS_SIDES):
            cols.append(F.element_at(triple, i + 1).alias(f"{col_name}_{side}_ODD"))
    return cols
