"""benchmarks/results_table.py — consolidated quality table generator."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))

import results_table  # noqa: E402


def test_render_with_fixture_dir(tmp_path):
    ev = {"MSE": 0.10, "MSE_refine1": 0.11, "LMSE": 0.15, "NOPMSE": 0.16,
          "n_clips": 1024, "gl_iters": 250}
    st = {"rel_margin_vs_gl_ci95": [0.269, 0.280]}
    (tmp_path / "eval_v2ext_winner_r4.json").write_text(json.dumps(ev))
    (tmp_path / "eval_v2ext_winner_stats.json").write_text(json.dumps(st))
    text = results_table.render(str(tmp_path))
    # present row: margin (0.15-0.10)/0.15 = +33.3%, CI rendered
    assert "+33.3%" in text
    assert "[+26.9%, +28.0%]" in text
    # absent rows degrade to pending, never crash
    assert "pending (`eval_v3_winner.json` not landed)" in text


def test_render_marks_proxy_gl_depth(tmp_path):
    ev = {"MSE": 0.2, "LMSE": 0.1, "NOPMSE": 0.3, "n_clips": 8,
          "gl_iters": 8}
    (tmp_path / "eval_v2scratch_winner_on_v1.json").write_text(
        json.dumps(ev))
    text = results_table.render(str(tmp_path))
    assert "(GL-8)" in text
    assert "-100.0%" in text  # (0.1-0.2)/0.1


def test_ci_falls_back_to_eval_embedded_stats(tmp_path):
    """`cli.evaluate --stats` embeds CI keys in the eval JSON itself; a
    row with no separate stats file must still render them (ADVICE r4)."""
    ev = {"MSE": 0.10, "LMSE": 0.15, "NOPMSE": 0.16, "n_clips": 1024,
          "gl_iters": 250, "rel_margin_vs_gl_ci95": [0.301, 0.322]}
    (tmp_path / "eval_v3_winner.json").write_text(json.dumps(ev))
    text = results_table.render(str(tmp_path))
    assert "[+30.1%, +32.2%]" in text


def test_missing_gl_iters_gets_no_suffix(tmp_path):
    """An eval JSON without gl_iters must not render '(GL-None)'."""
    ev = {"MSE": 0.1, "LMSE": 0.15, "NOPMSE": 0.16, "n_clips": 8}
    (tmp_path / "eval_v1rebuild_winner_r4.json").write_text(json.dumps(ev))
    text = results_table.render(str(tmp_path))
    assert "GL-None" not in text


def test_committed_results_render(tmp_path):
    """The real docs/results/ dir renders and the doc is regenerable."""
    repo = os.path.join(os.path.dirname(__file__), "..")
    text = results_table.render(os.path.join(repo, "docs", "results"))
    assert "v2 flagship" in text and "| 1024 |" in text
