"""Adaptive level selection tests (reference tests/test_adaptive_level.cu)."""

import numpy as np

from tpu_zstd.api.adaptive import (
    AdaptiveLevelSelector,
    Preference,
    analyze,
    is_compressible,
    select_adaptive_level,
)


def test_entropy_extremes(rng):
    rnd = rng.integers(0, 256, 65536, dtype=np.uint8).tobytes()
    assert analyze(rnd).entropy_bits > 7.9
    assert analyze(b"\x00" * 65536).entropy_bits < 0.01


def test_random_data_gets_low_level(rng):
    rnd = rng.integers(0, 256, 65536, dtype=np.uint8).tobytes()
    assert select_adaptive_level(rnd) == 1
    assert not is_compressible(rnd)


def test_repetitive_data_detected():
    rep = b"abcdefgh" * 8192
    p = analyze(rep)
    assert p.repetition > 0.5
    assert p.compressible
    assert select_adaptive_level(rep, Preference.RATIO) >= 9


def test_preference_ordering(corpus):
    data = corpus["text"]
    assert (
        select_adaptive_level(data, Preference.SPEED)
        <= select_adaptive_level(data, Preference.BALANCED)
        <= select_adaptive_level(data, Preference.RATIO)
    )


def test_selector_config(corpus):
    sel = AdaptiveLevelSelector(Preference.BALANCED)
    cfg = sel.config_for(corpus["text"])
    assert 1 <= cfg.level <= 22
    assert sel.last_profile is not None


def test_empty_input():
    assert select_adaptive_level(b"") == 1
