"""Shim: this script moved into the installable package.

Run `python scripts/move_agents.py ...` from the repo root as before, or use
the console script `overcooked-move-agents` after `pip install -e .`
(overcooked_ai_tpu.cli.move_agents).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from overcooked_ai_tpu.cli.move_agents import main

if __name__ == "__main__":
    main()
