"""One-time data import: reference `.layout` Python-literal files -> JSON.

The reference stores layouts as eval()'d Python literals
(reference utils.py:223-226) -- a format this framework deliberately does not
use. This script converts the benchmark's layout *data* (grids, order lists,
recipe values) into plain JSON under overcooked_ai_tpu/data/layouts/.

Usage: python scripts/import_reference_layouts.py [reference_layout_dir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from overcooked_ai_tpu.core.layout import (
    LAYOUT_DIR,
    build_layout,
    convert_reference_layout_text,
)


def main(src_dir):
    os.makedirs(LAYOUT_DIR, exist_ok=True)
    count, skipped = 0, []
    for fname in sorted(os.listdir(src_dir)):
        if not fname.endswith(".layout"):
            continue
        name = fname[: -len(".layout")]
        with open(os.path.join(src_dir, fname)) as f:
            cfg = convert_reference_layout_text(f.read())
        try:
            build_layout(name, cfg)  # sanity-check it parses + validates
        except Exception as e:  # noqa: BLE001 - report and continue
            skipped.append((name, repr(e)))
        with open(os.path.join(LAYOUT_DIR, name + ".json"), "w") as f:
            json.dump(cfg, f, indent=1)
        count += 1
    print(f"converted {count} layouts -> {LAYOUT_DIR}")
    for name, err in skipped:
        print(f"  note: {name} stored but failed build: {err}")


if __name__ == "__main__":
    src = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/reference/src/overcooked_ai_py/data/layouts"
    )
    main(src)
