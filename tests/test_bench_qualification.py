"""Replay tests for bench.py's epoch-qualification guard.

The scaling artifact's headline efficiency is the median over QUALIFIED
epochs; qualification has three layers (bracket probes, skew, per-side
band). These tests replay the recorded validation-run shapes that
calibrated each layer (BENCH.md round-6 items 3, 10, 12) so a future
re-tuning that silently re-opens one of the observed failure modes
fails here first. Pure arithmetic — no Spark session.
"""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def _epochs(pairs, probe_ok=None):
    probe_ok = probe_ok or [True] * len(pairs)
    return [{"low": lo, "high": hi, "ratio": lo / hi, "qualified": ok}
            for (lo, hi), ok in zip(pairs, probe_ok)]


def test_run9_near_proportional_contention_disqualified():
    # validation run 9 (recorded): epoch 1 ran low 1.55x / high 1.31x of
    # the run minima -> skew 1.18 passed, and its 0.465 ratio was
    # published as "qualified". The side band must reject it; epochs 2-3
    # were already probe-disqualified (post-bracket collapse).
    eps = _epochs([(66.345, 35.64), (59.08, 27.209), (42.807, 29.832)],
                  probe_ok=[True, False, False])
    bench.qualify_epochs(eps)
    assert eps[0]["self_consistent"]          # skew 1.18 inside band
    assert not eps[0]["side_ok"]              # low at 1.55x run min
    assert not any(e["qualified"] for e in eps)


def test_run8_uniform_drift_stays_qualified():
    # validation run 8 (recorded shape): the run started fast and slowed
    # ~25% uniformly — both good-ratio epochs sat ~1.26x over BOTH
    # minima. Skew ~1.0 and sides inside the 1.45 band: must qualify.
    eps = _epochs([(40.0, 13.0), (50.4, 16.4), (50.0, 16.25)])
    bench.qualify_epochs(eps)
    assert all(e["qualified"] for e in eps)


def test_interior_collapse_one_side_fails_skew():
    # validation run 2 (recorded shape): a collapse inside one epoch hit
    # the 8-core build 42% over the run best while its brackets read
    # clean; the low side stayed on-trend -> skew far below the band.
    eps = _epochs([(60.0, 20.0), (60.0, 28.4)])
    bench.qualify_epochs(eps)
    assert eps[0]["qualified"]
    assert not eps[1]["self_consistent"]
    assert not eps[1]["qualified"]


def test_low_side_inflation_fails_skew():
    # a 2-proc collapse inflates the LOW side only, which would inflate
    # the measured ratio (overstating efficiency) — must not qualify.
    eps = _epochs([(60.0, 20.0), (78.0, 20.0)])
    bench.qualify_epochs(eps)
    assert not eps[1]["qualified"]


def test_probe_disqualified_epoch_stays_out_even_if_consistent():
    # the build-time tests can only REMOVE qualification, never restore
    # an epoch whose bracket probes saw the collapse.
    eps = _epochs([(60.0, 20.0), (61.0, 20.3)], probe_ok=[True, False])
    bench.qualify_epochs(eps)
    assert eps[1]["self_consistent"] and eps[1]["side_ok"]
    assert not eps[1]["qualified"]
