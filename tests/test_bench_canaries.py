"""Round 12 (r11 verdict item 3): per-section bench canary flagging.

The committed round-11 bench showed untouched brute-force legs moving
+22-32% raw while the single start-of-run canary claimed a FASTER epoch
— a mid-run noise burst no single measurement can adjudicate.
`flag_canary_sections` turns the section-boundary canary units the
bench now emits (`section_canaries` in the JSON line) into explicit
flags. This test drives it with synthetic units emulating exactly that
failure: a busy-loop contaminating one section while the rest of the
run sits on the normal epoch."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import flag_canary_sections  # noqa: E402


def test_synthetic_contamination_is_flagged():
    # a busy-loop during the scale section: its boundary canary reads
    # 2.2x the epoch; everything else sits within noise of the median
    units = {
        "start": 1.00,
        "after_workloads": 1.03,
        "after_scale": 2.20,
        "after_corpus": 0.97,
    }
    assert flag_canary_sections(units) == ["after_scale"]


def test_uniform_epoch_shift_is_not_flagged():
    # a uniformly slower host moves the median with the values — that
    # is an EPOCH (value_canary_rel's job), not a section burst
    units = {
        "start": 1.8,
        "after_workloads": 1.9,
        "after_scale": 1.85,
        "after_corpus": 1.95,
    }
    assert flag_canary_sections(units) == []


def test_too_few_measurements_never_flag():
    assert flag_canary_sections({"start": 1.0, "after_corpus": 9.0}) == []
    assert flag_canary_sections({}) == []


def test_zero_units_ignored():
    units = {"start": 0.0, "a": 1.0, "b": 1.01, "c": 0.99, "d": 1.7}
    assert flag_canary_sections(units) == ["d"]


def test_multiple_bursts_all_flagged():
    units = {
        "start": 1.0,
        "after_workloads": 2.5,
        "after_scale": 1.02,
        "after_corpus": 0.3,
    }
    out = flag_canary_sections(units)
    assert out == ["after_corpus", "after_workloads"]


def test_retry_plan_sections():
    """Round 14 (r13 verdict item 2): flagged boundaries map to the
    section(s) they bound; >=2 flags retry everything; scale drops out
    when the scale section is disabled."""
    from bench import retry_plan

    assert retry_plan([]) == []
    assert retry_plan(["start"]) == ["workloads"]
    assert retry_plan(["after_workloads"]) == ["workloads", "scale"]
    assert retry_plan(["after_scale"]) == ["scale", "corpus"]
    assert retry_plan(["after_corpus"]) == ["corpus"]
    assert retry_plan(["start", "after_corpus"]) == [
        "workloads", "scale", "corpus"
    ]
    assert retry_plan(["after_workloads"], scale_on=False) == ["workloads"]
    assert retry_plan(["start", "after_scale"], scale_on=False) == [
        "workloads", "corpus"
    ]


def test_order_for_tail_puts_adjudication_record_last():
    """Round 15 (r14 verdict item 3): the driver keeps only the last
    2000 chars of bench stdout — r14's section_canary_flags/retried
    printed BEFORE value/queries and were truncated away. The JSON's
    key order must end with [...headline values, canaries, flags,
    retry trail] so the record survives the tail."""
    import json

    from bench import order_for_tail

    out = {
        "metric": "bench_total_wall",
        "section_canaries": {"start": 1.0},
        "section_canary_flags": ["after_corpus"],
        "retried": ["corpus"],
        "calibration": {"cal_gemm": 1.0},
        "value": 10.0,
        "recall": {},
        "canary_unit_sec": 1.0,
        "value_canary_rel": 10.0,
        "queries": {"q1": 0.5},
    }
    keys = list(order_for_tail(out))
    # flags/retried are strictly AFTER value and queries
    assert keys.index("section_canary_flags") > keys.index("value")
    assert keys.index("retried") > keys.index("queries")
    assert keys.index("section_canaries") > keys.index("value_canary_rel")
    # ...and the serialized tail (last 2000 chars) contains them all
    tail = json.dumps(order_for_tail(out))[-2000:]
    for k in ("value_canary_rel", "section_canary_flags", "retried",
              "queries"):
        assert f'"{k}"' in tail
    # keys absent from the run (no retry) are simply skipped
    out.pop("retried")
    assert "retried" not in order_for_tail(out)
