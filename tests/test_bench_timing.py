"""The bench slope-timing estimator must survive tunnel hiccups.

bench.py times pipelined device work through a ~50 ms-RTT tunnel whose
stalls land on whole runs. A stall inside a SHORT run deflates that
pair's slope; the old min-of-slopes scheme then picked the artifact
(observed on the real chip: a 17.5 ms encode step reported as 6.8 ms —
above the v5e roofline — and an IVF probe reported as 0.000 ms). These
tests drive `_slope_time` with a virtual clock so the failure modes are
pinned without hardware.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


class FakeDevice:
    """Virtual pipelined device: dispatch enqueues, materialize runs the
    queue on a virtual clock, optionally stalling on chosen runs."""

    def __init__(self, monkeypatch, per_op_s, hiccup_s=0.0,
                 hiccup_runs=()):
        self.per_op = per_op_s
        self.hiccup = hiccup_s
        self.hiccup_runs = set(hiccup_runs)
        self.clock = 0.0
        self.pending = 0
        self.runs = 0
        self.dispatches = 0
        monkeypatch.setattr(bench.time, "perf_counter",
                            lambda: self.clock)

    def dispatch(self):
        self.pending += 1
        self.dispatches += 1
        self.clock += 20e-6  # host-side dispatch cost

    def materialize(self, _):
        self.runs += 1
        self.clock += self.pending * self.per_op
        self.clock += 0.050  # constant RTT of the forcing fetch
        if self.runs in self.hiccup_runs or -1 in self.hiccup_runs:
            self.clock += self.hiccup
        self.pending = 0


def test_clean_runs_measure_true_cost(monkeypatch):
    dev = FakeDevice(monkeypatch, per_op_s=17.5e-3)
    est = bench._slope_time(dev.dispatch, dev.materialize, 2, 10)
    assert abs(est - 17.5e-3) / 17.5e-3 < 0.05


def test_hiccup_in_short_run_does_not_deflate(monkeypatch):
    # A 90 ms stall inside the first (short) run: the old estimator
    # reported ~6 ms for a 17.5 ms op here.
    dev = FakeDevice(monkeypatch, per_op_s=17.5e-3, hiccup_s=0.09,
                     hiccup_runs={1})
    est = bench._slope_time(dev.dispatch, dev.materialize, 2, 10)
    assert abs(est - 17.5e-3) / 17.5e-3 < 0.20


def test_hiccup_in_long_run_does_not_inflate(monkeypatch):
    dev = FakeDevice(monkeypatch, per_op_s=17.5e-3, hiccup_s=0.09,
                     hiccup_runs={2})
    est = bench._slope_time(dev.dispatch, dev.materialize, 2, 10)
    assert abs(est - 17.5e-3) / 17.5e-3 < 0.20


def test_scattered_hiccups_median_out(monkeypatch):
    # stalls on every third run, both short and long — the Theil–Sen
    # median must stay near truth while >half the pairwise slopes are
    # contaminated on one side or the other
    dev = FakeDevice(monkeypatch, per_op_s=5e-3, hiccup_s=0.06,
                     hiccup_runs={3, 6, 9, 12})
    est = bench._slope_time(dev.dispatch, dev.materialize, 2, 10)
    assert abs(est - 5e-3) / 5e-3 < 0.30


def test_tiny_ops_escalate_run_length(monkeypatch):
    # a 0.3 ms op at n_hi=50 has ~13 ms of signal against 50 ms RTT
    # noise: the estimator must lengthen its runs until the spread is
    # measurable, and still land near truth with stalls present
    dev = FakeDevice(monkeypatch, per_op_s=0.3e-3, hiccup_s=0.05,
                     hiccup_runs={2, 5})
    est = bench._slope_time(dev.dispatch, dev.materialize, 6, 50)
    assert dev.dispatches > 300  # escalation actually happened
    assert abs(est - 0.3e-3) / 0.3e-3 < 0.25


def test_escalation_is_bounded(monkeypatch):
    # a ~0-cost op must not spin forever chasing min_signal
    dev = FakeDevice(monkeypatch, per_op_s=1e-7)
    bench._slope_time(dev.dispatch, dev.materialize, 2, 10,
                      max_dispatches=500)
    assert dev.dispatches <= 1000


def test_degenerate_bounds_do_not_crash(monkeypatch):
    dev = FakeDevice(monkeypatch, per_op_s=1e-3)
    est = bench._slope_time(dev.dispatch, dev.materialize, 2, 2)
    assert est > 0
