"""bench.py quiet-window guard (r10 verdict 'What's wrong' #2): a timed
row taken at load1 > threshold must be retried and, failing that, stamped
contended — so round-over-round bench deltas stop being weather."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_quiet_window_passes_when_quiet(monkeypatch):
    monkeypatch.setattr(bench, "_load1", lambda: 0.5)
    load1, contended = bench._quiet_window("t")
    assert load1 == 0.5 and contended is False


def test_quiet_window_retries_then_stamps_contended(monkeypatch):
    calls = []
    monkeypatch.setattr(bench, "_load1", lambda: calls.append(1) or 9.9)
    monkeypatch.setattr(bench, "QUIET_LOAD1", 2.0)
    monkeypatch.setattr(bench, "QUIET_RETRIES", 2)
    monkeypatch.setattr(bench, "QUIET_SLEEP", 0.0)
    load1, contended = bench._quiet_window("t")
    assert contended is True
    assert len(calls) == 3  # initial probe + 2 bounded retries


def test_quiet_window_converges_when_load_drops(monkeypatch):
    seq = iter([9.9, 9.9, 1.0])
    monkeypatch.setattr(bench, "_load1", lambda: next(seq))
    monkeypatch.setattr(bench, "QUIET_LOAD1", 2.0)
    monkeypatch.setattr(bench, "QUIET_RETRIES", 5)
    monkeypatch.setattr(bench, "QUIET_SLEEP", 0.0)
    load1, contended = bench._quiet_window("t")
    assert load1 == 1.0 and contended is False


def test_quiet_window_disabled_with_negative_threshold(monkeypatch):
    monkeypatch.setattr(bench, "_load1", lambda: 50.0)
    monkeypatch.setattr(bench, "QUIET_LOAD1", -1.0)
    load1, contended = bench._quiet_window("t")
    assert contended is False
