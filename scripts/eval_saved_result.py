#!/usr/bin/env python
"""Compatibility entry point (reference scripts/eval_saved_result.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from supnerf_tpu.cli.eval_saved_result import main

if __name__ == "__main__":
    main(sys.argv[1:])
