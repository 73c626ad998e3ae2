"""Elo / Bradley-Terry rating tests (utils/elo.py, runtime/league.py)."""
import json
import math
import os

import pytest

from drl_tetris_tpu.utils.elo import (
    ELO_SCALE, EloTracker, LeagueHistory, elo_table, fit_elo)
from drl_tetris_tpu.utils.scoreboard import Scoreboard


def _board(results):
    b = Scoreboard()
    for winner, loser, n in results:
        for _ in range(n):
            b.declare_winner(winner, loser)
    return b


class TestEloTracker:
    def test_winner_gains_loser_loses(self):
        t = EloTracker()
        t.record("a", "b")
        assert t.rating("a") > 1000 > t.rating("b")
        # zero-sum update
        assert t.rating("a") + t.rating("b") == pytest.approx(2000)

    def test_upset_moves_more(self):
        t = EloTracker()
        t.ratings = {"strong": 1200.0, "weak": 800.0}
        before = t.rating("weak")
        t.record("weak", "strong")
        upset_gain = t.rating("weak") - before
        t2 = EloTracker()
        t2.ratings = {"strong": 1200.0, "weak": 800.0}
        t2.record("strong", "weak")
        expected_gain = t2.rating("strong") - 1200.0
        assert upset_gain > expected_gain

    def test_draw_moves_toward_equal(self):
        t = EloTracker()
        t.ratings = {"a": 1100.0, "b": 900.0}
        t.record_draw("a", "b")
        assert t.rating("a") < 1100 and t.rating("b") > 900

    def test_record_scoreboard_matches_manual(self):
        b = _board([("a", "b", 3), ("b", "a", 1)])
        t = EloTracker()
        t.record_scoreboard(b)
        assert t.rating("a") > t.rating("b")
        assert t.n_games["a"] == 4
        assert "ELO" in t.table()


class TestFitElo:
    def test_ordering_and_anchor(self):
        b = _board([("a", "b", 8), ("b", "a", 2),
                    ("b", "c", 8), ("c", "b", 2),
                    ("a", "c", 9), ("c", "a", 1)])
        r = fit_elo(b)
        assert r["a"] > r["b"] > r["c"]
        assert sum(r.values()) / 3 == pytest.approx(1000.0, abs=1e-6)

    def test_two_player_winrate_maps_to_elo_gap(self):
        # 75% win rate ~ 191 Elo points (no regularization)
        b = _board([("a", "b", 75), ("b", "a", 25)])
        r = fit_elo(b, regularize=0.0)
        gap = r["a"] - r["b"]
        expected = ELO_SCALE * math.log(75 / 25)
        assert gap == pytest.approx(expected, rel=1e-3)

    def test_undefeated_player_finite(self):
        b = _board([("a", "b", 10)])
        r = fit_elo(b)
        assert math.isfinite(r["a"]) and r["a"] > r["b"]

    def test_transitive_consistency(self):
        # a beats b at the same rate b beats c => equal gaps
        b = _board([("a", "b", 7), ("b", "a", 3),
                    ("b", "c", 7), ("c", "b", 3)])
        r = fit_elo(b, regularize=0.0)
        assert (r["a"] - r["b"]) == pytest.approx(r["b"] - r["c"], rel=0.05)

    def test_degenerate_sizes(self):
        assert fit_elo(Scoreboard()) == {}
        one = Scoreboard(["solo"])
        assert fit_elo(one) == {"solo": 1000.0}
        assert "a" in elo_table({"a": 1000.0})


class TestLeagueHistory:
    def test_history_accumulates_and_anchors(self, tmp_path):
        league = LeagueHistory(out_dir=str(tmp_path), anchor="random")
        league.steps["random"] = 0
        b1 = _board([("step_100", "random", 6), ("random", "step_100", 2)])
        r1 = league.add_result(b1, 100, "step_100")
        assert r1["random"] == pytest.approx(1000.0)
        assert r1["step_100"] > 1000.0
        b2 = _board([("step_200", "random", 8),
                     ("step_200", "step_100", 6), ("step_100", "step_200", 2)])
        r2 = league.add_result(b2, 200, "step_200")
        assert r2["step_200"] > r2["step_100"] > r2["random"]
        curve = league.curve()
        assert [e.step for e in curve] == [0, 100, 200]
        lines = (tmp_path / "elo_history.jsonl").read_text().splitlines()
        assert len(lines) == 2
        assert json.loads(lines[-1])["step"] == 200
