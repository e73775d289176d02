"""Refresh the in-repo XLA cache seed from the live cache directory.

Run after a warm ``bench.py`` run whenever the default forward graph
changed, so the driver's end-of-round bench never cold-compiles even if
the machine (and ``~/.cache``) was reset in between::

    python bench.py && python scripts/save_xla_cache.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opticalflow_tpu.utils.cache_seed import (SEED_TARBALL, cache_dir,
                                              save_cache_seed)


def main() -> None:
    n = save_cache_seed()
    size = os.path.getsize(SEED_TARBALL)
    print(f"saved {n} entries from {cache_dir()} "
          f"-> {SEED_TARBALL} ({size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
