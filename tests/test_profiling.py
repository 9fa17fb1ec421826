"""StepTimer: steps/sec must come from the step-counter delta, not the
number of tick() calls (the detector runner ticks once per log_interval)."""

import time

from agenda_tpu.utils.profiling import StepTimer


def test_tick_every_step_matches_wall_rate(monkeypatch):
    now = [0.0]
    monkeypatch.setattr(time, "time", lambda: now[0])
    t = StepTimer()
    for _ in range(5):
        rate = t.tick()
        now[0] += 0.5
    assert abs(rate - 2.0) < 1e-9  # 1 step / 0.5 s


def test_tick_at_log_boundaries_reports_steps_not_events(monkeypatch):
    now = [0.0]
    monkeypatch.setattr(time, "time", lambda: now[0])
    t = StepTimer()
    # ticked every 10 steps; 10 steps take 1 s => 10 steps/s, not 1 event/s
    rate = 0.0
    for step in (10, 20, 30, 40):
        rate = t.tick(step)
        now[0] += 1.0
    assert abs(rate - 10.0) < 1e-9


def test_window_trims_oldest(monkeypatch):
    now = [0.0]
    monkeypatch.setattr(time, "time", lambda: now[0])
    t = StepTimer(window=3)
    # slow start then fast steady state; window must forget the slow steps
    t.tick(0)
    now[0] += 100.0
    t.tick(1)
    now[0] += 0.1
    t.tick(2)
    now[0] += 0.1
    rate = t.tick(3)
    assert abs(rate - 2 / 0.2) < 1e-6


def test_first_tick_and_zero_elapsed_return_zero(monkeypatch):
    now = [0.0]
    monkeypatch.setattr(time, "time", lambda: now[0])
    t = StepTimer()
    assert t.tick(1) == 0.0
    assert t.tick(2) == 0.0  # same timestamp: no division by zero
