"""scripts/analyze_queue.py — the TPU measurement-window decision tool
must group rows per tag, report job status, and call A/B verdicts
correctly (a wrong verdict silently flips a performance default)."""

import importlib.util
import json
import sys
from pathlib import Path

SCRIPT = Path(__file__).resolve().parents[1] / "scripts" / "analyze_queue.py"


def _run(tmp_path, capsys, lines):
    f = tmp_path / "results.jsonl"
    f.write_text("\n".join(json.dumps(x) if not isinstance(x, str) else x
                           for x in lines) + "\n")
    spec = importlib.util.spec_from_file_location("analyze_queue", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["analyze_queue.py", str(f)]
    try:
        mod.main()
    finally:
        sys.argv = old
    return capsys.readouterr().out


def test_groups_status_and_verdicts(tmp_path, capsys):
    out = _run(tmp_path, capsys, [
        {"tag": "roi_base", "row": {"ms_per_call": 2.0}},
        {"tag": "roi_base", "done": True},
        {"tag": "roi_kron", "row": {"ms_per_call": 1.5}},
        {"tag": "roi_kron", "done": True},
        {"tag": "roi_g16", "row": {"ms_per_call": 2.5}},
        {"tag": "roi_g16", "exit": 124},
        {"tag": "train_b128", "skipped": "relay down"},
        "not json at all",                       # must be tolerated
    ])
    assert "=== roi_base [done] ===" in out
    assert "=== roi_g16 [exit 124] ===" in out
    assert "=== train_b128 [skipped: relay down] ===" in out
    # kron 1.5 < 2.0*0.97 -> WIN; g16 2.5 > 2.0*1.03 -> LOSS
    assert "canvas pooling=kron (1000 ROIs): 2.0 -> 1.5 ms  [WIN]" in out
    assert "canvas group=16 (1000 ROIs): 2.0 -> 2.5 ms  [LOSS]" in out


def test_stage_filter_picks_full_program_row(tmp_path, capsys):
    """The s2d verdict must compare the cumulative full-extract stage
    rows, not whichever stage row happens to come first."""
    out = _run(tmp_path, capsys, [
        {"tag": "ext_stages", "row": {"stage": "backbone", "ms": 30.0}},
        {"tag": "ext_stages", "row": {"stage": "extract", "ms": 67.0}},
        {"tag": "ext_stages", "done": True},
        {"tag": "ext_stages_s2d",
         "row": {"stage": "extract", "ms": 64.0}},
        {"tag": "ext_stages_s2d", "done": True},
    ])
    assert "s2d stem (full extract, b8): 67.0 -> 64.0 ms  [WIN]" in out


def test_flat_band(tmp_path, capsys):
    out = _run(tmp_path, capsys, [
        {"tag": "roi_base", "row": {"ms_per_call": 2.0}},
        {"tag": "roi_kron", "row": {"ms_per_call": 2.02}},
    ])
    assert "[flat]" in out


def test_missing_file(tmp_path, capsys):
    spec = importlib.util.spec_from_file_location("analyze_queue", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["analyze_queue.py", str(tmp_path / "nope.jsonl")]
    try:
        mod.main()
    finally:
        sys.argv = old
    assert "queue has not run" in capsys.readouterr().out
