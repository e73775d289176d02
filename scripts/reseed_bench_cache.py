"""Rebuild the in-repo XLA cache seed with exactly the entries bench.py uses.

The live ``~/.cache/opticalflow_tpu_xla`` accumulates every sweep/test
program ever compiled (observed 205 MB); seeding all of it into git is
waste. This script finds the minimal read-set: it copies the live cache
into a scratch dir with ancient atimes, runs the warm bench there, and
keeps only the entries the run actually read (relatime grants one atime
update per file because ctime is fresh) plus any it wrote.

    python scripts/reseed_bench_cache.py
"""

import os
import shutil
import sys
import tarfile
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ANCIENT = 946684800.0  # 2000-01-01


def main() -> None:
    live = os.path.expanduser("~/.cache/opticalflow_tpu_xla")
    scratch = tempfile.mkdtemp(prefix="oftpu_seed_")
    for f in os.listdir(live):
        if f.endswith("-cache"):
            shutil.copy2(os.path.join(live, f), os.path.join(scratch, f))
            os.utime(os.path.join(scratch, f), (ANCIENT, ANCIENT))
    # Pre-extract the existing repo seed with ancient times too: bench's
    # restore_cache_seed would otherwise write any tarball-only entries
    # with fresh mtimes, defeating the used-filter below and letting stale
    # programs accumulate in the regenerated seed forever.  The env var
    # MUST be set before anything imports opticalflow_tpu — the package
    # __init__ wires jax's cache dir from it at import time.
    os.environ["OPTICALFLOW_TPU_CACHE"] = scratch
    from opticalflow_tpu.utils import cache_seed as _cs
    _cs.restore_cache_seed()
    for f in os.listdir(scratch):
        if f.endswith("-cache"):
            os.utime(os.path.join(scratch, f), (ANCIENT, ANCIENT))

    import jax
    import opticalflow_tpu  # noqa: F401  (wires the cache dir to scratch)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    t0 = time.time()
    import bench
    bench.main()

    used = [f for f in os.listdir(scratch)
            if f.endswith("-cache")
            and max(os.stat(os.path.join(scratch, f)).st_atime,
                    os.stat(os.path.join(scratch, f)).st_mtime) >= t0 - 60]
    if not used:
        print("no entries marked as read — keeping everything (atime "
              "tracking unavailable?)")
        used = [f for f in os.listdir(scratch) if f.endswith("-cache")]

    seed = os.path.join(ROOT, "xla_cache_seed", "cache.tar.gz")
    tmp = seed + ".tmp"
    with tarfile.open(tmp, "w:gz") as tf:
        for f in sorted(used):
            tf.add(os.path.join(scratch, f), arcname=f)
    os.replace(tmp, seed)
    print(f"seed rebuilt: {len(used)} entries, "
          f"{os.path.getsize(seed) / 1e6:.1f} MB")
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
