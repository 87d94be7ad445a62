"""Analytic invariants of the textbook STOI implementation
(pb_chime5_tpu/testing/metrics.py, VERDICT r4 #7).  These pin the
properties the quality gates rely on — identity, scale invariance,
monotonicity in SNR, degenerate-input handling — not third-party
reference outputs (none are available in this environment)."""

import numpy as np
import pytest

from pb_chime5_tpu.testing.metrics import stoi


@pytest.fixture
def speech_like(rng):
    n = 16000 * 4
    env = np.abs(rng.standard_normal(n // 400 + 1)).repeat(400)[:n]
    return rng.standard_normal(n) * env


def test_identity_and_scale_invariance(speech_like):
    x = speech_like
    assert stoi(x, x) == pytest.approx(1.0, abs=1e-9)
    # band-energy normalization makes the measure gain-invariant
    assert stoi(x, 3.7 * x) == pytest.approx(1.0, abs=1e-9)
    assert stoi(x, 0.01 * x) == pytest.approx(1.0, abs=1e-9)


def test_monotone_in_snr(speech_like, rng):
    x = speech_like
    scores = []
    for snr_db in (20, 10, 5, 0, -5, -10):
        noise = rng.standard_normal(len(x))
        noise *= (np.linalg.norm(x) / np.linalg.norm(noise)
                  * 10.0 ** (-snr_db / 20.0))
        scores.append(stoi(x, x + noise))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 0.98          # 20 dB SNR barely hurts
    assert scores[-1] < 0.4          # -10 dB SNR is unintelligible


def test_uncorrelated_is_low(speech_like, rng):
    assert stoi(speech_like, rng.standard_normal(len(speech_like))) < 0.25


def test_degenerate_inputs(speech_like):
    x = speech_like
    # shorter than one 384 ms segment of active speech -> nan, not crash
    assert np.isnan(stoi(x[:1000], x[:1000]))
    assert np.isnan(stoi(np.zeros(16000), np.zeros(16000)))
    # length mismatch: truncates to the common prefix
    assert stoi(x, x[:-100]) == pytest.approx(1.0, abs=1e-6)


def test_silent_frame_removal_ignores_gaps(speech_like, rng):
    """Corrupting only the CLEAN-silent region must not move the score:
    those frames are removed by the 40 dB dynamic-range gate."""
    x = np.concatenate([speech_like, np.zeros(16000)])
    y = x.copy()
    base = stoi(x, y)
    y2 = y.copy()
    y2[-16000:] += 0.001 * rng.standard_normal(16000)
    assert stoi(x, y2) == pytest.approx(base, abs=5e-3)
