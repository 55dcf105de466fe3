"""bench.py --compare: canary-normalized cross-record comparison.

Pure-python (no Spark) — pins the r11 advisor fix (a 0.0 or null
canary reading is handled explicitly, not silently dropped by a
truthiness filter) and the r11 verdict #2 extension (sched_ratio is
APPLIED: a CPU-flagged mover whose raw ratio is explained by the
scheduler canary moves to `sched_closed` instead of earning an A/B).
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import compare_records  # noqa: E402


def _write(tmp_path, name, rec):
    p = tmp_path / name
    p.write_text(json.dumps(rec))
    return str(p)


def test_compare_applies_sched_ratio(tmp_path):
    # box: CPU flat (canary 1.0 -> 1.0), scheduler 2x slower
    # (sched 1.0 -> 2.0, absolute swing 1.0 s). q_sched moved 1.8x raw
    # with a 0.8 s absolute delta — inside the band once divided by
    # sched_ratio AND within the canary's own absolute swing, so it
    # closes. q_real moved 4x — survives both normalizations. q_long
    # moved the same 1.8x RATIO but +8 s ABSOLUTE — per-job scheduling
    # overhead cannot explain 8 s against a 1 s canary swing, so the
    # absolute-delta gate keeps it flagged (sched_normalized annotated).
    old = {
        "canary_pre_sec": 1.0, "canary_post_sec": 1.0,
        "canary_sched_pre_sec": 1.0, "canary_sched_post_sec": 1.0,
        "queries": {"q_flat": 1.0, "q_sched": 1.0, "q_real": 1.0, "q_long": 10.0},
    }
    new = {
        "canary_pre_sec": 1.0, "canary_post_sec": 1.0,
        "canary_sched_pre_sec": 2.0, "canary_sched_post_sec": 2.0,
        "queries": {"q_flat": 1.0, "q_sched": 1.8, "q_real": 4.0, "q_long": 18.0},
    }
    out = compare_records(
        _write(tmp_path, "old.json", old), _write(tmp_path, "new.json", new)
    )
    assert out["canary_ratio"] == 1.0
    assert out["sched_ratio"] == 2.0
    assert sorted(out["normalized_movers"]) == ["q_long", "q_real"]
    assert out["normalized_movers"]["q_real"]["sched_normalized"] == 2.0
    assert out["normalized_movers"]["q_long"]["sched_normalized"] == 0.9
    assert list(out["sched_closed"]) == ["q_sched"]
    assert out["sched_closed"]["q_sched"]["sched_normalized"] == 0.9


def test_compare_handles_null_and_zero_canary_fields(tmp_path):
    # a null stored alongside a valid twin is skipped, not fatal; the
    # surviving reading carries the median (advisor r11: `is not None`,
    # not truthiness)
    old = {
        "canary_pre_sec": 0.5, "canary_post_sec": None,
        "queries": {"q": 1.0},
    }
    new = {
        "canary_pre_sec": 1.0, "canary_post_sec": 1.0,
        "queries": {"q": 2.0},
    }
    out = compare_records(
        _write(tmp_path, "o.json", old), _write(tmp_path, "n.json", new)
    )
    assert out["canary_ratio"] == 2.0  # median(1.0) / median(0.5 only)
    assert out["normalized_median_ratio"] == 1.0
    assert "sched_ratio" not in out  # pre-r11 record: reported absent

    # an explicit 0.0 canary is a reading, not a missing field: it must
    # enter the median — and the degenerate all-zero record raises the
    # same NAMED error the sched path does (advisor r12: a bare
    # ZeroDivisionError at canary_ratio explained nothing), on either
    # side of the comparison
    old0 = {"canary_pre_sec": 0.0, "canary_post_sec": 0.0, "queries": {"q": 1.0}}
    with pytest.raises(ValueError, match="non-positive CPU canary"):
        compare_records(
            _write(tmp_path, "o0.json", old0), _write(tmp_path, "n.json", new)
        )
    with pytest.raises(ValueError, match="non-positive CPU canary"):
        compare_records(
            _write(tmp_path, "n.json", new), _write(tmp_path, "o0.json", old0)
        )

    # ...and the NEW-side all-zero sched canary fails loudly AT THE
    # RATIO, not data-dependently inside the mover loop (r12 review:
    # a mover-free record would otherwise succeed silently)
    olds = {
        "canary_pre_sec": 1.0, "canary_post_sec": 1.0,
        "canary_sched_pre_sec": 1.0, "canary_sched_post_sec": 1.0,
        "queries": {"q": 1.0},
    }
    news = {
        "canary_pre_sec": 1.0, "canary_post_sec": 1.0,
        "canary_sched_pre_sec": 0.0, "canary_sched_post_sec": 0.0,
        "queries": {"q": 1.0},  # no movers — must STILL raise
    }
    with pytest.raises(ZeroDivisionError, match="sched canary"):
        compare_records(
            _write(tmp_path, "os.json", olds), _write(tmp_path, "ns.json", news)
        )
