"""scripts/sweep_merge.py is now the standing bench-measurement
protocol (r15), so its merge/flag logic gets the same regression
cover the advice findings earned host_probe/bench: a tooling bug here
would silently mis-state the round's headline performance claim."""

import json
import sys

import pytest


def _write(tmp_path, name, queries, extra=None):
    d = {"metric": "total_query_wall_sec", "unit": "sec", "sf": 0.1,
         "value": round(sum(queries.values()), 3),
         "n_queries": len(queries), "method": {"name": "median3"},
         "queries": queries, "remeasured_outliers": extra or {},
         "notes": "test"}
    p = tmp_path / name
    p.write_text(json.dumps(d))
    return str(p)


def _run_main(monkeypatch, capsys, argv):
    from scripts import sweep_merge

    monkeypatch.setattr(sys, "argv", ["sweep_merge.py", *argv])
    sweep_merge.main()
    return capsys.readouterr()


def test_min_merge_flags_and_anchor_report(tmp_path, monkeypatch,
                                           capsys):
    from scripts import sweep_merge

    anchor = sweep_merge.anchor_queries()
    assert len(anchor) >= 185  # the frozen r12 sweep resolves from git
    q1, q2 = sorted(anchor)[:2]
    # q1 regresses in BOTH sweeps (a real flag); q2 is slow in sweep 1
    # only (stall contamination — the min-merge must clear it)
    s1 = _write(tmp_path, "s1.json",
                {q1: 2 * anchor[q1] + 0.4, q2: 2 * anchor[q2] + 0.4},
                extra={q2: {"original": 9.9, "remeasured": 9.8,
                            "kept": True}})
    s2 = _write(tmp_path, "s2.json",
                {q1: 2 * anchor[q1] + 0.5, q2: 0.5 * anchor[q2]})
    out = _run_main(monkeypatch, capsys, [s1, s2])
    merged = json.loads(out.out)
    # per-query MIN
    assert merged["queries"][q1] == 2 * anchor[q1] + 0.4
    assert merged["queries"][q2] == 0.5 * anchor[q2]
    assert merged["n_queries"] == 2
    assert merged["value"] == pytest.approx(
        merged["queries"][q1] + merged["queries"][q2], abs=5e-4)
    # provenance from every input sweep is carried, as a LIST of
    # records each tagged with its source sweep (r16 advice: a
    # dict-merge let later sweeps shadow the record that supplied the
    # kept min timing)
    recs = merged["remeasured_outliers"][q2]
    assert isinstance(recs, list) and len(recs) == 1
    assert recs[0]["source_sweep"] == s1
    assert recs[0]["original"] == 9.9
    assert merged["method"]["name"] == "min-merge-of-full-sweeps"
    # the genuinely-regressed row is flagged; the stall-cleared one not
    assert f"FLAG {q1}" in out.err
    assert f"FLAG {q2}" not in out.err
    assert "over 2x+0.3s bar: 1" in out.err


def test_refuses_single_sweep_and_mismatched_sets(tmp_path,
                                                  monkeypatch, capsys):
    s1 = _write(tmp_path, "s1.json", {"a": 1.0})
    with pytest.raises(SystemExit, match="need >= 2"):
        _run_main(monkeypatch, capsys, [s1])
    s2 = _write(tmp_path, "s2.json", {"a": 1.0, "b": 2.0})
    with pytest.raises(SystemExit, match="different query sets"):
        _run_main(monkeypatch, capsys, [s1, s2])


def test_refuses_mismatched_headers(tmp_path, monkeypatch, capsys):
    """r16 advice: the merged header is copied from sweeps[0], so
    min-merging sidecars from different SFs/metrics/methods must be an
    explicit error, not a silently-nonsense merge."""
    s1 = _write(tmp_path, "s1.json", {"a": 1.0})
    p2 = tmp_path / "s2.json"
    d = json.loads((tmp_path / "s1.json").read_text())
    d["sf"] = 0.01
    p2.write_text(json.dumps(d))
    with pytest.raises(SystemExit, match="disagrees on 'sf'"):
        _run_main(monkeypatch, capsys, [s1, str(p2)])
    d["sf"] = 0.1
    d["method"] = {"name": "single-shot"}
    p2.write_text(json.dumps(d))
    with pytest.raises(SystemExit, match="per-sweep method"):
        _run_main(monkeypatch, capsys, [s1, str(p2)])


def test_outlier_provenance_kept_per_sweep(tmp_path, monkeypatch,
                                           capsys):
    """Both sweeps remeasured the same query: BOTH records survive,
    each tagged with its source sweep path."""
    s1 = _write(tmp_path, "s1.json", {"a": 1.0},
                extra={"a": {"original": 3.0, "remeasured": 1.0}})
    s2 = _write(tmp_path, "s2.json", {"a": 0.9},
                extra={"a": {"original": 2.0, "remeasured": 0.9}})
    out = _run_main(monkeypatch, capsys, [s1, s2])
    merged = json.loads(out.out)
    recs = merged["remeasured_outliers"]["a"]
    assert [r["source_sweep"] for r in recs] == [s1, s2]
    assert [r["original"] for r in recs] == [3.0, 2.0]


def test_p90_not_maximum_for_small_sets(tmp_path, monkeypatch, capsys):
    """r16 advice: sorted(rs)[int(0.9*n)] returned the maximum for
    n<=10; the len-1 index must sit below the max outlier."""
    from scripts import sweep_merge

    anchor = sweep_merge.anchor_queries()
    qs = sorted(anchor)[:5]
    # four queries exactly at anchor (ratio 1.0), one at 1.9x
    q_out = qs[-1]
    queries = {q: anchor[q] for q in qs[:-1]}
    queries[q_out] = 1.9 * anchor[q_out]
    s1 = _write(tmp_path, "s1.json", queries)
    s2 = _write(tmp_path, "s2.json", queries)
    out = _run_main(monkeypatch, capsys, [s1, s2])
    assert "p90 1.00" in out.err  # index 3 of 5, not the 1.9x max
    assert "max 1.90" in out.err


def test_unanchored_queries_reported_not_dropped(tmp_path, monkeypatch,
                                                 capsys):
    """Post-r12 registrations have no anchor row: they must survive
    into the merged sidecar and be LISTED as unanchored, never
    silently skipped (the r15 advice class: computed outputs silently
    excluding data)."""
    s1 = _write(tmp_path, "s1.json", {"brand_new_query": 1.0})
    s2 = _write(tmp_path, "s2.json", {"brand_new_query": 0.9})
    out = _run_main(monkeypatch, capsys, [s1, s2])
    merged = json.loads(out.out)
    assert merged["queries"] == {"brand_new_query": 0.9}
    assert "not in anchor" in out.err
    assert "brand_new_query" in out.err
