"""Parity tests for the flashscore pipeline (SURVEY.md §2.2-2.4, FIXTURES.md §B).

The fixture JSON is synthesized in-test and exercises every edge the
reference's code paths imply: non-Finished row (filtered), null in kept
columns (dropped), non-numeric score (→ null via try_cast), lineup != 11
players (→ skipped), malformed odds arity (→ nulls), missing bookmaker
(→ nulls).
"""

import json

import pytest

from data_pipeline_eng_project_1_spark.plans import flashscore
from data_pipeline_eng_project_1_spark.sources.json_source import read_matches


def _player_list(prefix, n):
    return [{"name": f"{prefix}{i}"} for i in range(1, n + 1)]


def _record(status="Finished", country="France", tournament="Ligue 1",
            home="PSG", away="OM", hs="2", as_="1", year=2023, month=11,
            day=4, hour=18, minute=38, home_n=11, away_n=11, bookmakers=None):
    return {
        "current_status": status,
        "current_country": country,
        "current_tournament": tournament,
        "participant_home": home,
        "participant_away": away,
        "participant_home_current_score": hs,
        "participant_away_current_score": as_,
        "year": year, "month": month, "day": day, "hour": hour, "minute": minute,
        "match_hour": f"{hour}:{minute}",
        "lineups_data": {
            "Team1": _player_list("H", home_n),
            "Team2": _player_list("A", away_n),
        },
        "bookmakers_data": bookmakers if bookmakers is not None else [
            {"bookmaker": "Betclic.fr", "odds": ["1.5", "3.2", "5.0"]},
            {"bookmaker": "bet365", "odds": ["1.4", "3.5", "5.5"]},
        ],
    }


@pytest.fixture(scope="module")
def matches_df(spark, tmp_path_factory):
    records = [
        _record(),  # clean row
        _record(status="Scheduled", home="Lyon"),          # filtered out
        _record(country=None, home="Lille"),               # na.drop
        _record(home="Nantes", hs="abc"),                  # score -> null
        _record(home="Brest", home_n=10),                  # home lineup skipped
        _record(home="Nice", bookmakers=[
            {"bookmaker": "Betclic.fr", "odds": ["1.1", "2.2"]},   # arity != 3
            {"bookmaker": "Winamax", "odds": ["2.0", "3.0", "4.0"]},
        ]),
    ]
    p = tmp_path_factory.mktemp("flashscore") / "dump.json"
    p.write_text(json.dumps(records))
    return read_matches(spark, str(p))


def test_match_finished_schema_and_rows(matches_df):
    out = flashscore.transform_matches(matches_df)
    assert out.columns == flashscore.MATCH_COLUMNS
    rows = {r["NAME_TEAM_HOME"]: r for r in out.collect()}
    # Scheduled row filtered, null-country row dropped -> 4 rows remain.
    assert set(rows) == {"PSG", "Nantes", "Brest", "Nice"}
    assert rows["PSG"]["SCORE_TEAM_HOME"] == 2
    assert rows["PSG"]["SCORE_TEAM_AWAY"] == 1
    assert rows["PSG"]["COUNTRY_MATCH"] == "France"
    assert rows["PSG"]["YEAR_MATCH"] == 2023
    # Non-numeric score -> null cell, row retained (coerce semantics).
    assert rows["Nantes"]["SCORE_TEAM_HOME"] is None
    # Deterministic id: 64 hex chars, distinct per match.
    ids = {r["ID_MATCH"] for r in rows.values()}
    assert len(ids) == 4 and all(len(i) == 64 for i in ids)


def test_match_id_is_deterministic(matches_df):
    a = {r["NAME_TEAM_HOME"]: r["ID_MATCH"]
         for r in flashscore.transform_matches(matches_df).collect()}
    b = {r["NAME_TEAM_HOME"]: r["ID_MATCH"]
         for r in flashscore.transform_matches(matches_df).collect()}
    assert a == b


def test_lineups(matches_df):
    home, away = flashscore.transform_lineups(matches_df)
    assert home.columns == ["ID_MATCH"] + [f"NAME_PLAYER_{i}" for i in range(1, 12)]
    hrows = home.collect()
    arows = away.collect()
    # 5 Finished rows; Brest's home lineup has 10 players -> skipped from HOME
    # only. (The reference filters only on status for lineups, not na.drop —
    # the null-country match keeps its lineup.)
    assert len(hrows) == 4
    assert len(arows) == 5
    psg = next(r for r in hrows if r["NAME_PLAYER_1"] == "H1")
    assert psg["NAME_PLAYER_11"] == "H11"


def test_lineup_ids_join_matches(matches_df):
    match = flashscore.transform_matches(matches_df)
    home, _ = flashscore.transform_lineups(matches_df)
    joined = home.join(match, "ID_MATCH", "inner")
    # Every complete home lineup of a surviving match joins exactly once.
    assert joined.count() == 3  # PSG, Nantes, Nice (Brest skipped, Lille dropped)


def test_odds(matches_df):
    odds = flashscore.transform_odds(matches_df)
    assert len(odds.columns) == 25
    rows = {r["ID_MATCH"]: r for r in odds.collect()}
    match = {r["NAME_TEAM_HOME"]: r["ID_MATCH"]
             for r in flashscore.transform_matches(matches_df).collect()}
    psg = rows[match["PSG"]]
    assert psg["BETCLIC_HOME_ODD"] == 1.5
    assert psg["BETCLIC_NIL_ODD"] == 3.2
    assert psg["BET365_AWAY_ODD"] == 5.5
    assert psg["WINAMAX_HOME_ODD"] is None  # missing bookmaker -> nulls
    nice = rows[match["Nice"]]
    assert nice["BETCLIC_HOME_ODD"] is None  # arity != 3 -> nulls
    assert nice["WINAMAX_NIL_ODD"] == 3.0


def test_run_pipeline_writes_four_tables(spark, matches_df, tmp_path):
    import glob

    records = [_record()]
    src = tmp_path / "in"
    src.mkdir()
    (src / "d.json").write_text(json.dumps(records))
    out = tmp_path / "out"
    flashscore.run_pipeline(spark, str(src / "d.json"), str(out))
    for t in ("MATCH_FINISHED", "HOME_STARTING_LINEUP",
              "AWAY_STARTING_LINEUP", "ODDS"):
        files = glob.glob(f"{out}/{t}/*.parquet")
        assert files, t
        assert spark.read.parquet(f"{out}/{t}").count() == 1


def test_run_pipeline_observed_metrics(spark, tmp_path):
    from data_pipeline_eng_project_1_spark.plans import flashscore

    p = tmp_path / "dump.json"
    p.write_text(json.dumps([_record(), _record(home="Nice2")]))
    out = str(tmp_path / "obs_out")
    tables, metrics = flashscore.run_pipeline_observed(
        spark, str(p), out, mode="overwrite")
    for name in ("MATCH_FINISHED", "HOME_STARTING_LINEUP",
                 "AWAY_STARTING_LINEUP", "ODDS"):
        written = spark.read.parquet(f"{out}/{name}").count()
        assert metrics[name]["n_rows"] == written
        assert metrics[name]["n_with_id"] == written  # every row carries the id
