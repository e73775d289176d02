"""XLA cache-seed save/restore round-trip (pure file ops, no jax)."""

import os
import tarfile

from opticalflow_tpu.utils import cache_seed


def test_save_restore_roundtrip(tmp_path, monkeypatch):
    live = tmp_path / "live"
    live.mkdir()
    (live / "jit_a-1234-cache").write_bytes(b"A" * 100)
    (live / "jit_b-5678-cache").write_bytes(b"B" * 200)
    (live / "notacache.txt").write_bytes(b"skip me")
    monkeypatch.setenv("OPTICALFLOW_TPU_CACHE", str(live))
    seed = tmp_path / "seed" / "cache.tar.gz"
    monkeypatch.setattr(cache_seed, "SEED_TARBALL", str(seed))

    assert cache_seed.save_cache_seed() == 2
    with tarfile.open(seed) as tf:
        assert sorted(m.name for m in tf.getmembers()) == [
            "jit_a-1234-cache", "jit_b-5678-cache"]

    # fresh (wiped) cache dir: both entries restored
    fresh = tmp_path / "fresh"
    monkeypatch.setenv("OPTICALFLOW_TPU_CACHE", str(fresh))
    assert cache_seed.restore_cache_seed() == 2
    assert (fresh / "jit_a-1234-cache").read_bytes() == b"A" * 100

    # present entries are left alone (no rewrite), missing ones filled in
    (fresh / "jit_a-1234-cache").write_bytes(b"NEWER")
    os.remove(fresh / "jit_b-5678-cache")
    assert cache_seed.restore_cache_seed() == 1
    assert (fresh / "jit_a-1234-cache").read_bytes() == b"NEWER"
    assert (fresh / "jit_b-5678-cache").read_bytes() == b"B" * 200


def test_restore_is_safe_without_seed(tmp_path, monkeypatch):
    monkeypatch.setenv("OPTICALFLOW_TPU_CACHE", str(tmp_path / "c"))
    monkeypatch.setattr(cache_seed, "SEED_TARBALL",
                        str(tmp_path / "absent.tar.gz"))
    assert cache_seed.restore_cache_seed() == 0

    # corrupt tarball must not raise either
    bad = tmp_path / "bad.tar.gz"
    bad.write_bytes(b"not a tarball")
    monkeypatch.setattr(cache_seed, "SEED_TARBALL", str(bad))
    assert cache_seed.restore_cache_seed() == 0
