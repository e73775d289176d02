"""Persistent-XLA-cache seeding.

This machine's ``~/.cache`` is wiped on resets, while the repo persists.
A cold compile of the headline bench program takes ~8-10 minutes through
the remote AOT service — long enough to blow any reasonable time budget
(this is exactly what lost the round-2 scoreboard number).  The fix:
keep a tarball of the warm compilation cache *in the repo* and restore
any missing entries into the live cache directory before compiling.

Usage:
    from opticalflow_tpu.utils.cache_seed import restore_cache_seed
    restore_cache_seed()          # cheap no-op when entries are present

Refresh the seed after any commit that changes the default forward graph
(and a warm ``bench.py`` run) with::

    python scripts/save_xla_cache.py

Cache entries are keyed by (program HLO, compile options, jax/runtime
versions), so stale entries are never *wrong* — they are simply unused
and cost only disk space.
"""

from __future__ import annotations

import os
import tarfile

__all__ = ["restore_cache_seed", "save_cache_seed", "SEED_TARBALL",
           "cache_dir"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
SEED_TARBALL = os.path.join(_REPO_ROOT, "xla_cache_seed", "cache.tar.gz")


def cache_dir() -> str:
    return os.environ.get(
        "OPTICALFLOW_TPU_CACHE",
        os.path.expanduser("~/.cache/opticalflow_tpu_xla"))


def restore_cache_seed(verbose: bool = False) -> int:
    """Extract seed entries missing from the live cache dir.

    Returns the number of entries restored.  Never raises: a corrupt or
    absent seed must not break the caller (bench still runs, just cold).
    """
    target = cache_dir()
    if target in ("", "0"):
        return 0
    try:
        if not os.path.exists(SEED_TARBALL):
            return 0
        os.makedirs(target, exist_ok=True)
        have = set(os.listdir(target))
        restored = 0
        with tarfile.open(SEED_TARBALL, "r:gz") as tf:
            for member in tf.getmembers():
                name = os.path.basename(member.name)
                if not member.isfile() or name in have:
                    continue
                src = tf.extractfile(member)
                if src is None:
                    continue
                tmp = os.path.join(target, f".{name}.tmp")
                with open(tmp, "wb") as out:
                    out.write(src.read())
                os.replace(tmp, os.path.join(target, name))
                restored += 1
        if verbose and restored:
            print(f"[cache_seed] restored {restored} entries -> {target}")
        return restored
    except Exception as e:  # pragma: no cover - defensive
        if verbose:
            print(f"[cache_seed] restore failed: {e}")
        return 0


def save_cache_seed(min_bytes: int = 0) -> int:
    """Write the current live cache into the repo seed tarball.

    Returns the number of entries saved."""
    src = cache_dir()
    entries = [f for f in sorted(os.listdir(src))
               if f.endswith("-cache")
               and os.path.getsize(os.path.join(src, f)) >= min_bytes]
    os.makedirs(os.path.dirname(SEED_TARBALL), exist_ok=True)
    tmp = SEED_TARBALL + ".tmp"
    with tarfile.open(tmp, "w:gz") as tf:
        for f in entries:
            tf.add(os.path.join(src, f), arcname=f)
    os.replace(tmp, SEED_TARBALL)
    return len(entries)
