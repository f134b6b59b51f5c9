"""Shim: this script moved into the installable package.

Run `python scripts/eval_pool.py ...` from the repo root as before, or use
the console script `overcooked-eval-pool` after `pip install -e .`
(overcooked_ai_tpu.cli.eval_pool).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from overcooked_ai_tpu.cli.eval_pool import main

if __name__ == "__main__":
    main()
