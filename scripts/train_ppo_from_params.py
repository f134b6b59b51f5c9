"""Shim: this script moved into the installable package.

Run `python scripts/train_ppo_from_params.py ...` from the repo root as before, or use
the console script `overcooked-train-from-params` after `pip install -e .`
(overcooked_ai_tpu.cli.train_ppo_from_params).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from overcooked_ai_tpu.cli.train_ppo_from_params import main

if __name__ == "__main__":
    main()
