"""Arena-reuse tuning (utils/host_alloc.py).

The critical regression here: mallopt's value parameter is a C int, so an
unclamped threshold like 1<<40 is truncated by ctypes to 0 — which sets
M_MMAP_THRESHOLD=0 and forces EVERY allocation through fresh mmap, the
exact opposite of the intended tuning (and catastrophic on lazy-memory
hosts).  The calls must carry declared argtypes and a clamped value.
"""
import ctypes

import pytest

from psa_tpu.utils import host_alloc


class _FakeMallopt:
    def __init__(self):
        self.calls = []
        self.argtypes = None
        self.restype = None

    def __call__(self, param, value):
        # mimic ctypes truncation when argtypes were not declared
        if self.argtypes is None:
            value = ctypes.c_int(value & 0xFFFFFFFF).value
        self.calls.append((param, value))
        return 1


class _FakeLibc:
    def __init__(self):
        self.mallopt = _FakeMallopt()


@pytest.fixture
def fake_libc(monkeypatch):
    libc = _FakeLibc()
    monkeypatch.setattr(host_alloc.ctypes, 'CDLL',
                        lambda *a, **k: libc)
    monkeypatch.setattr(host_alloc, '_state', None)
    monkeypatch.delenv('PSA_TPU_NO_ARENA_REUSE', raising=False)
    monkeypatch.delenv('MALLOC_MMAP_THRESHOLD_', raising=False)
    monkeypatch.delenv('MALLOC_TRIM_THRESHOLD_', raising=False)
    return libc


def test_threshold_clamped_to_int_max(fake_libc):
    assert host_alloc.enable_arena_reuse(1 << 40) is True
    values = [v for _, v in fake_libc.mallopt.calls]
    assert values, "mallopt never called"
    for v in values:
        assert 0 < v <= 2**31 - 1, f"unclamped/truncated value {v}"


def test_argtypes_declared(fake_libc):
    host_alloc.enable_arena_reuse()
    assert fake_libc.mallopt.argtypes == (ctypes.c_int, ctypes.c_int)


def test_both_thresholds_set(fake_libc):
    host_alloc.enable_arena_reuse()
    params = {p for p, _ in fake_libc.mallopt.calls}
    assert params == {host_alloc._M_MMAP_THRESHOLD,
                      host_alloc._M_TRIM_THRESHOLD}


def test_idempotent(fake_libc):
    assert host_alloc.enable_arena_reuse() is True
    n = len(fake_libc.mallopt.calls)
    assert host_alloc.enable_arena_reuse() is True
    assert len(fake_libc.mallopt.calls) == n      # no second mallopt round


def test_opt_out(fake_libc, monkeypatch):
    monkeypatch.setenv('PSA_TPU_NO_ARENA_REUSE', '1')
    monkeypatch.setattr(host_alloc, '_state', None)
    assert host_alloc.enable_arena_reuse() is False
    assert not fake_libc.mallopt.calls


def test_env_tunables_short_circuit(fake_libc, monkeypatch):
    """When glibc was already tuned at startup via env vars (the campaign
    launch path, which covers >2 GiB blocks), no mallopt call is made."""
    monkeypatch.setenv('MALLOC_MMAP_THRESHOLD_', '999999999999')
    monkeypatch.setenv('MALLOC_TRIM_THRESHOLD_', '999999999999')
    monkeypatch.setattr(host_alloc, '_state', None)
    assert host_alloc.enable_arena_reuse() is True
    assert not fake_libc.mallopt.calls


def test_small_env_tunables_do_not_short_circuit(fake_libc, monkeypatch):
    """Env thresholds SMALLER than ours (e.g. an RSS-reduction tuning that
    lowers them) must not be mistaken for arena reuse — mallopt overrides
    them at runtime."""
    monkeypatch.setenv('MALLOC_MMAP_THRESHOLD_', '131072')
    monkeypatch.setenv('MALLOC_TRIM_THRESHOLD_', '131072')
    monkeypatch.setattr(host_alloc, '_state', None)
    assert host_alloc.enable_arena_reuse() is True
    assert fake_libc.mallopt.calls, "mallopt must run despite small env vars"
