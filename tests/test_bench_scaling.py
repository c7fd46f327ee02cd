"""Unit tests for bench_scaling.py's measurement-hygiene helpers.

These guard the two failure modes that actually occurred on the
shared sandbox host: (a) a regeneration whose long N-level runs all
landed in a co-tenant contention window produced a physically
impossible super-linear efficiency, and (b) regeneration rewrote the
whole BASELINE.md, clobbering hand-written evidence sections. No
Spark session needed — pure functions.
"""

import importlib.util
import sys
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "bench_scaling", Path(__file__).resolve().parents[1] / "bench_scaling.py"
)
bench_scaling = importlib.util.module_from_spec(_spec)
sys.modules["bench_scaling"] = bench_scaling
_spec.loader.exec_module(bench_scaling)


def test_efficiency_gate_rejects_superlinear():
    # the 2026-08-18 contended run: N best 1,017 docs/s, 4N 9,646
    assert not bench_scaling.efficiency_valid((9646.3 / 1016.6) / 4.0)


def test_efficiency_gate_rejects_collapse():
    # a 4N level that is SLOWER than N (e.g. the wide level hit a
    # bandwidth-throttled window) is equally invalid as a baseline
    assert not bench_scaling.efficiency_valid(0.1)


def test_efficiency_gate_accepts_recorded_baseline():
    assert bench_scaling.efficiency_valid(0.882)
    assert bench_scaling.efficiency_valid(0.8)
    assert bench_scaling.efficiency_valid(1.0)


def test_merge_manual_preserves_hand_written_tail():
    old = (
        "# old measured stuff\n\nnumbers\n\n"
        + bench_scaling.MANUAL_MARKER
        + " preserved across regeneration -->\n\n"
        "## Hand-written evidence\n\ncontent that must survive\n"
    )
    new = "# fresh measured stuff\n\nnew numbers\n"
    merged = bench_scaling.merge_manual(new, old)
    assert merged.startswith("# fresh measured stuff")
    assert "old measured stuff" not in merged
    assert "content that must survive" in merged
    # marker itself survives so the NEXT regeneration preserves too
    assert bench_scaling.MANUAL_MARKER in merged


def test_merge_manual_without_marker_or_old_file():
    new = "# fresh\n"
    assert bench_scaling.merge_manual(new, None) == new
    assert bench_scaling.merge_manual(new, "# old, no marker\n") == new


def test_live_baseline_md_has_the_marker():
    md = (Path(__file__).resolve().parents[1] / "BENCH" / "BASELINE.md").read_text()
    assert bench_scaling.MANUAL_MARKER in md


# --- bench.py's clean-record protection -------------------------------

_bspec = importlib.util.spec_from_file_location(
    "bench_mod", Path(__file__).resolve().parents[1] / "bench.py"
)
bench_mod = importlib.util.module_from_spec(_bspec)
sys.modules["bench_mod"] = bench_mod
_bspec.loader.exec_module(bench_mod)


CLEAN_PRIOR = '{"pages_best_contended": false, "pages_docs_per_s": 15706.8}'


def _full(contended=False, dps=9000.0, bw=1.2):
    return {
        "pages_best_contended": contended,
        "pages_docs_per_s": dps,
        "pages_run_stats": [{"wall_s": 30.0, "mem_bw_gbps": bw}],
    }


def test_contended_run_diverts_away_from_clean_record(tmp_path):
    rec = tmp_path / "last_run_full.json"
    rec.write_text(CLEAN_PRIOR)
    out = bench_mod.divert_record(rec, _full(contended=True))
    assert out.name == "last_run_full_contended.json"
    # the clean record is untouched by construction (caller writes to out)
    assert "15706.8" in rec.read_text()


def test_slower_run_in_subhealthy_window_diverts(tmp_path):
    """The 2026-08-19 artifact: bw 1.19 passed the 1.0 floor yet the
    suite ran 2.2x slower — slower + sub-healthy window must divert."""
    rec = tmp_path / "last_run_full.json"
    rec.write_text(CLEAN_PRIOR)
    out = bench_mod.divert_record(rec, _full(dps=8805.4, bw=1.19))
    assert out.name == "last_run_full_contended.json"


def test_faster_or_healthy_clean_run_writes_in_place(tmp_path):
    rec = tmp_path / "last_run_full.json"
    rec.write_text(CLEAN_PRIOR)
    # faster: legitimate new record even in a mediocre window
    assert bench_mod.divert_record(rec, _full(dps=16000.0, bw=1.5)) == rec
    # slower but HEALTHY window: a real (code) slowdown must surface
    assert bench_mod.divert_record(rec, _full(dps=14000.0, bw=4.8)) == rec


def test_contended_or_missing_prior_is_overwritable(tmp_path):
    rec = tmp_path / "last_run_full.json"
    # no prior record: write in place
    assert bench_mod.divert_record(rec, _full(contended=True)) == rec
    # prior record itself contended: write in place
    rec.write_text('{"pages_best_contended": true}')
    assert bench_mod.divert_record(rec, _full(contended=True)) == rec
    # unparseable prior: write in place
    rec.write_text("not json")
    assert bench_mod.divert_record(rec, _full(contended=True)) == rec
