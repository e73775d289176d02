#!/usr/bin/env python
"""Compatibility shim: the reference's documented entry point
(``python script_pwc.py im1 im2 out.flo``) delegating to
``opticalflow_tpu.cli.script_pwc``.  Like the reference, it defaults to
``./pwc_net.pth.tar`` in the working directory."""

import sys

from opticalflow_tpu.cli.script_pwc import main

if __name__ == "__main__":
    sys.exit(main())
