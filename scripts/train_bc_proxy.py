"""Shim: this script moved into the installable package.

Run `python scripts/train_bc_proxy.py ...` from the repo root as before, or use
the console script `overcooked-train-bc-proxy` after `pip install -e .`
(overcooked_ai_tpu.cli.train_bc_proxy).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from overcooked_ai_tpu.cli.train_bc_proxy import main

if __name__ == "__main__":
    main()
