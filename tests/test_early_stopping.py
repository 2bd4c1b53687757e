"""EarlyStopping helper: PL semantics regression tests (the round-1 advisor
found the inline versions never reset the wait counter; the helper pins the
fixed behavior)."""

from heart_murmur_detection_tpu.train.checkpoints import EarlyStopping


def test_wait_resets_on_improvement_max():
    es = EarlyStopping("max", min_delta=0.001, patience=3)
    assert not es.step(0.5)       # first value = improvement over -inf
    assert not es.step(0.5)       # plateau: wait 1
    assert not es.step(0.5005)    # below min_delta: wait 2
    assert not es.step(0.6)       # real improvement: wait RESETS
    assert not es.step(0.6)       # wait 1
    assert not es.step(0.6)       # wait 2
    assert es.step(0.6)           # wait 3 -> stop


def test_min_mode_strict_delta():
    es = EarlyStopping("min", min_delta=0.01, patience=2)
    assert not es.step(1.0)
    assert not es.step(0.995)     # improvement < min_delta: wait 1
    assert es.step(0.999)         # wait 2 -> stop
    es2 = EarlyStopping("min", min_delta=0.01, patience=2)
    assert not es2.step(1.0)
    assert not es2.step(0.95)     # real improvement resets
    assert not es2.step(0.95)
    assert es2.step(0.95)


def test_patience_none_never_stops():
    es = EarlyStopping("max", patience=None)
    for _ in range(100):
        assert not es.step(0.0)
