"""Metrics aggregator-stack + meters tests.

Mirrors the reference test strategy (reference tests/test_metrics.py:
nested/new_root aggregation semantics) plus state_dict round-trips, since
meter state is checkpoint-serialized.
"""

import time

import pytest

from fbk_fairseq_st_tpu.train import metrics
from fbk_fairseq_st_tpu.train.meters import (
    AverageMeter,
    MetersDict,
    StopwatchMeter,
    SumMeter,
    TimeMeter,
)


@pytest.fixture(autouse=True)
def _fresh_metrics():
    metrics.reset()
    yield
    metrics.reset()


def test_nested_aggregate_sees_all_scopes():
    with metrics.aggregate("outer") as outer:
        metrics.log_scalar("loss", 1.0)
        with metrics.aggregate("inner") as inner:
            metrics.log_scalar("loss", 3.0)
    assert outer.get_smoothed_value("loss") == 2.0
    assert inner.get_smoothed_value("loss") == 3.0
    # default aggregator is always active
    assert metrics.get_smoothed_value("default", "loss") == 2.0


def test_reentrant_named_scope_shares_aggregator():
    with metrics.aggregate("a") as first:
        metrics.log_scalar("x", 1.0)
        with metrics.aggregate("a") as second:
            metrics.log_scalar("x", 3.0)
        assert first is second
    assert metrics.get_smoothed_value("a", "x") == 2.0


def test_new_root_suspends_outer_scopes():
    with metrics.aggregate("train"):
        metrics.log_scalar("loss", 10.0)
        with metrics.aggregate(new_root=True) as valid_agg:
            metrics.log_scalar("loss", 4.0)
        metrics.log_scalar("loss", 20.0)
    assert valid_agg.get_smoothed_value("loss") == 4.0
    assert metrics.get_smoothed_value("train", "loss") == 15.0
    # the validation value must not leak into default either
    assert metrics.get_smoothed_value("default", "loss") == 15.0


def test_anonymous_scopes_are_independent():
    with metrics.aggregate() as a:
        metrics.log_scalar("v", 1.0)
    with metrics.aggregate() as b:
        metrics.log_scalar("v", 9.0)
    assert a.get_smoothed_value("v") == 1.0
    assert b.get_smoothed_value("v") == 9.0


def test_log_derived_and_priority_order():
    with metrics.aggregate("t") as agg:
        metrics.log_scalar("nll_loss", 2.0, priority=20)
        metrics.log_derived("ppl", lambda m: 2 ** m["nll_loss"].avg, priority=30)
        metrics.log_scalar("loss", 1.0, priority=10)
    vals = agg.get_smoothed_values()
    assert list(vals.keys()) == ["loss", "nll_loss", "ppl"]
    assert vals["ppl"] == 4.0


def test_log_scalar_weighted_average():
    metrics.log_scalar("l", 1.0, weight=1)
    metrics.log_scalar("l", 4.0, weight=3)
    assert metrics.get_smoothed_value("default", "l") == pytest.approx(3.25)


def test_log_scalar_sum():
    metrics.log_scalar_sum("n", 2)
    metrics.log_scalar_sum("n", 5)
    assert metrics.get_smoothed_value("default", "n") == 7


def test_state_dict_roundtrip_restores_values():
    with metrics.aggregate("train"):
        metrics.log_scalar("loss", 2.5, round=3)
        metrics.log_scalar_sum("updates", 7)
        metrics.log_start_time("wall", priority=790, round=0)
        metrics.log_stop_time("wall")
    payload = metrics.state_dict()

    metrics.reset()
    assert metrics.get_meters("train") is None
    metrics.load_state_dict(payload)
    assert metrics.get_smoothed_value("train", "loss") == 2.5
    assert metrics.get_smoothed_value("train", "updates") == 7
    # derived meters must not be serialized; stopwatch must be
    restored = metrics.get_meters("train")
    assert isinstance(restored["wall"], StopwatchMeter)


def test_load_state_dict_updates_active_default():
    metrics.log_scalar("loss", 1.0)
    payload = metrics.state_dict()
    metrics.reset()
    metrics.load_state_dict(payload)
    # new logging must land in the restored aggregator, not a stale one
    metrics.log_scalar("loss", 3.0)
    assert metrics.get_smoothed_value("default", "loss") == 2.0


def test_average_meter_rounding_and_array_values():
    import numpy as np

    m = AverageMeter(round=2)
    m.update(np.float64(1.0 / 3.0), n=1)
    assert m.smoothed_value == 0.33
    assert isinstance(m.smoothed_value, float)


def test_average_meter_zero_weight_keeps_latest():
    m = AverageMeter()
    m.update(5.0, n=0)
    assert m.smoothed_value == 5.0  # no weight yet -> latest value
    m.update(1.0, n=2)
    assert m.smoothed_value == 1.0


def test_time_meter_resume_continuity():
    m = TimeMeter()
    m.update(100)
    state = m.state_dict()
    time.sleep(0.01)
    m2 = TimeMeter()
    m2.load_state_dict(state)
    assert m2.n == 100
    assert m2.elapsed_time >= state["init"]
    assert m2.avg > 0


def test_stopwatch_meter_avg_and_reset():
    m = StopwatchMeter()
    m.start()
    time.sleep(0.01)
    m.stop(n=5)
    assert m.sum >= 0.01
    assert m.avg == pytest.approx(m.sum / 5)
    state = m.state_dict()
    m2 = StopwatchMeter()
    m2.load_state_dict(state)
    assert m2.n == 5 and m2.sum == m.sum


def test_meters_dict_rejects_reassignment():
    d = MetersDict()
    d.add_meter("x", SumMeter(), 10)
    with pytest.raises(AssertionError):
        d.add_meter("x", SumMeter(), 10)


def test_meters_dict_hides_underscore_keys():
    d = MetersDict()
    d.add_meter("_private", SumMeter(), 1)
    d.add_meter("public", SumMeter(), 2)
    assert list(d.get_smoothed_values().keys()) == ["public"]


def test_meters_dict_state_roundtrip_preserves_priorities():
    d = MetersDict()
    d.add_meter("b", AverageMeter(), 20)
    d.add_meter("a", SumMeter(), 10)
    d["b"].update(4.0)
    d["a"].update(2)
    d2 = MetersDict()
    d2.load_state_dict(d.state_dict())
    assert list(d2.keys()) == ["a", "b"]
    assert d2.get_smoothed_value("a") == 2
    assert d2.get_smoothed_value("b") == 4.0
