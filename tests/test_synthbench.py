"""Annotator accuracy floors on the synthetic ground-truth benchmark.

Guards the upgraded DSP annotators (low-band onset emphasis, harmonic
chord templates, chord-route key estimation, chord-aligned downbeats —
reference role: madmom's trained models in m2t/annotation.py:29-111)
against silent regressions: VERDICT round 1 found the original heuristics
scored beat F 0.13 / downbeat F 0.0 / key 0.46 with no test noticing.

The floors sit below the measured scores (see PERFORMANCE.md "Annotator
accuracy") by a margin that absorbs seed noise but fails on any real
regression.
"""

import numpy as np
import pytest

from llark_tpu.audio.synthbench import (
    chord_frame_recall,
    f_measure_events,
    run_benchmark,
    tempo_accuracy,
)


def test_scoring_utils():
    # event F-measure: exact match, offset miss, partial
    assert f_measure_events([1.0, 2.0], [1.0, 2.0]) == 1.0
    assert f_measure_events([1.0, 2.0], [1.2, 2.2]) == 0.0
    assert f_measure_events([1.0, 5.0], [1.0, 2.0]) == pytest.approx(0.5)
    # one truth event can't be claimed twice
    assert f_measure_events([1.0, 1.01], [1.0]) == pytest.approx(2 * 0.5 / 1.5)
    # tempo accuracy1 vs accuracy2 (octave credit)
    assert tempo_accuracy(120.0, 121.0)
    assert not tempo_accuracy(60.0, 120.0)
    assert tempo_accuracy(60.0, 120.0, octaves=(1.0, 2.0, 0.5))
    # frame recall grid
    truth = [{"start_time": 0.0, "end_time": 1.0, "chord": "C major"}]
    pred_half = [{"start_time": 0.0, "end_time": 0.5, "chord": "C major"}]
    assert chord_frame_recall(truth, truth, 1.0) == 1.0
    assert chord_frame_recall(pred_half, truth, 1.0) == pytest.approx(0.5)


def test_annotator_accuracy_floors():
    scores = run_benchmark(n=12, seconds=10.0, seed=7)
    # measured: key_mirex 0.875, tempo_acc2 1.0, beat_f 0.998,
    # downbeat_f 1.0, bpb 1.0, chord recall 0.92 (2026-08, this seed)
    assert scores["key_mirex"] >= 0.70
    assert scores["tempo_acc1"] >= 0.80
    assert scores["tempo_acc2"] >= 0.90
    assert scores["beat_f"] >= 0.90
    assert scores["downbeat_f"] >= 0.85
    assert scores["bpb_acc"] >= 0.80
    assert scores["chord_frame_recall"] >= 0.80


@pytest.mark.slow
def test_annotator_accuracy_floors_large():
    """The full 40-clip sweep quoted in PERFORMANCE.md."""
    scores = run_benchmark(n=40, seconds=12.0, seed=0)
    assert scores["key_exact"] >= 0.75
    assert scores["key_mirex"] >= 0.80
    assert scores["tempo_acc2"] >= 0.95
    assert scores["beat_f"] >= 0.95
    assert scores["downbeat_f"] >= 0.95
    assert scores["chord_frame_recall"] >= 0.85
