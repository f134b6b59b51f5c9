"""Copy a trained checkpoint into the demo's agent directory.

Reference overcooked_demo/move_agents.py: validates a trained run directory
and copies it under the demo AGENT_DIR so the server can load it by name
(`ppo:<dir>` / `bc:<dir>` NPC kinds, demo/game.py npc_from_kind).

Usage:
    python scripts/move_agents.py runs/ppo_cramped_room_shaped demo_agents/my_ppo
    python scripts/move_agents.py runs/bc_train demo_agents/my_bc --kind bc
"""

import argparse
import json
import os
import shutil


def validate(src: str, kind: str) -> None:
    if kind == "ppo":
        # orbax checkpoint dirs are numbered steps + config.json
        entries = os.listdir(src)
        steps = [e for e in entries if e.isdigit()]
        if not steps:
            raise SystemExit(
                f"{src}: no orbax step directories found (not a PPO run dir)"
            )
        cfg = os.path.join(src, "config.json")
        if not os.path.exists(cfg):
            raise SystemExit(f"{src}: missing config.json")
        with open(cfg) as f:
            json.load(f)
    elif kind == "bc":
        if not os.path.exists(os.path.join(src, "model.msgpack")):
            raise SystemExit(f"{src}: missing model.msgpack (not a BC dir)")
    else:
        raise SystemExit(f"unknown kind {kind!r} (ppo|bc)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="trained run directory")
    ap.add_argument("dst", help="destination under the demo agent dir")
    ap.add_argument("--kind", default="ppo", choices=["ppo", "bc"])
    ap.add_argument(
        "--overwrite", action="store_true",
        help="replace an existing destination",
    )
    args = ap.parse_args()

    validate(args.src, args.kind)
    if os.path.exists(args.dst):
        if not args.overwrite:
            raise SystemExit(f"{args.dst} exists (pass --overwrite)")
        shutil.rmtree(args.dst)
    shutil.copytree(args.src, args.dst)
    print(f"copied {args.src} -> {args.dst}; load in the demo as "
          f"'{args.kind}:{args.dst}'")


if __name__ == "__main__":
    main()
