"""Host-fingerprinted persistent compile cache (round-4 VERDICT item 3).

XLA:CPU AOT executables bake in the compile host's machine features;
reloading them on a different CPU warns (``cpu_aot_loader ... could lead
to execution errors such as SIGILL``) or crashes.  The cache directory is
therefore keyed by a host fingerprint — an entry planted under a foreign
host's key must never be visible to this host.
"""
import os

import pytest

from psa_tpu.utils import compile_cache as cc


def test_fingerprint_stable_and_short():
    fp1, fp2 = cc.host_fingerprint(), cc.host_fingerprint()
    assert fp1 == fp2
    assert len(fp1) == 16 and all(c in "0123456789abcdef" for c in fp1)


def test_fingerprint_tracks_cpu_features(monkeypatch):
    """A host with different CPU feature flags (e.g. AMX present vs absent)
    must map to a different cache directory — that IS the miss."""
    native = cc.host_fingerprint()
    monkeypatch.setattr(cc, "_cpu_feature_flags",
                        lambda: "fpu amx_tile amx_int8 avx512f")
    foreign = cc.host_fingerprint()
    assert foreign != native


def test_foreign_entry_is_a_miss(tmp_path, monkeypatch):
    """Plant an executable under a foreign host's key: resolving the cache
    on this host must select a different directory that does not contain
    the foreign entry."""
    monkeypatch.setenv("PSA_TPU_COMPILE_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("PSA_TPU_NO_COMPILE_CACHE", raising=False)
    # foreign host's cache: same base, different fingerprint
    monkeypatch.setattr(cc, "_cpu_feature_flags", lambda: "amx-having-host")
    foreign_dir = tmp_path / cc.host_fingerprint()
    foreign_dir.mkdir()
    (foreign_dir / "xla_executable_deadbeef").write_bytes(b"\x90" * 16)
    monkeypatch.undo()
    monkeypatch.setenv("PSA_TPU_COMPILE_CACHE_DIR", str(tmp_path))

    native_dir = tmp_path / cc.host_fingerprint()
    assert native_dir != foreign_dir
    # resolve as enable_persistent_cache would (without clobbering the
    # session's live jax config): the directory layout is the contract
    resolved = os.path.join(str(tmp_path), cc.host_fingerprint())
    assert resolved == str(native_dir)
    assert not os.path.exists(os.path.join(resolved,
                                           "xla_executable_deadbeef"))


def test_enabled_dir_is_fingerprinted():
    """The live session's cache dir (enabled at psa_tpu import) must end
    with this host's fingerprint unless the user overrode the location or
    disabled the cache."""
    active = cc._enabled_dir
    if active is None:
        pytest.skip("cache disabled in this environment")
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        pytest.skip("user-specified cache dir wins, not fingerprinted")
    assert os.path.basename(active) == cc.host_fingerprint()
