#!/usr/bin/env python
"""Standalone entry point (parity with reference main.py:28-41): runs the
CLI, or the REST API with --serve."""
from depthmap_tpu.frontends.cli import run

if __name__ == "__main__":
    raise SystemExit(run())
