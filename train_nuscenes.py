#!/usr/bin/env python
"""Compatibility entry point (reference train_nuscenes.py)."""
import sys

from supnerf_tpu.cli.train import main

if __name__ == "__main__":
    main(sys.argv[1:])
