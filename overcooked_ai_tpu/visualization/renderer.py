"""State rendering (reference StateVisualizer equivalent,
reference visualization/state_visualizer.py:37-314).

The reference blits licensed sprite-sheet assets with pygame; this renderer
draws an original tile/glyph scheme with PIL so it runs headless, needs no
binary assets, and produces RGB arrays for notebooks, gym `render()`, the
web demo, and trajectory videos. A `StateVisualizer` class mirrors the
reference API surface (render_state / display_rendered_trajectory).
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw

TILE = 48

COLORS = {
    "floor": (40, 40, 48),
    "counter": (130, 110, 90),
    "pot": (60, 60, 66),
    "onion_disp": (200, 170, 60),
    "tomato_disp": (190, 60, 50),
    "dish_disp": (210, 210, 215),
    "serve": (90, 160, 90),
    "onion": (230, 190, 70),
    "tomato": (220, 70, 60),
    "dish": (240, 240, 245),
    "soup_idle": (160, 120, 60),
    "soup_cooking": (230, 140, 40),
    "soup_ready": (90, 220, 90),
    "player0": (80, 140, 230),
    "player1": (90, 200, 120),
    "player2": (200, 120, 200),
    "player3": (230, 200, 90),
    "text": (235, 235, 235),
}

TERRAIN_FILL = {
    " ": "floor",
    "X": "counter",
    "P": "pot",
    "O": "onion_disp",
    "T": "tomato_disp",
    "D": "dish_disp",
    "S": "serve",
}

TERRAIN_GLYPH = {"P": "P", "O": "O", "T": "T", "D": "D", "S": "S"}


def _draw_object(draw, cx, cy, name, r=TILE // 5):
    color = COLORS.get(name, COLORS["dish"])
    draw.ellipse([cx - r, cy - r, cx + r, cy + r], fill=color)


def _soup_color(obj):
    if obj.get("is_ready"):
        return "soup_ready"
    if obj.get("is_cooking"):
        return "soup_cooking"
    return "soup_idle"


def render_state_rgb(spec, state_dict, hud: str = "") -> np.ndarray:
    """Render a reference-format state dict to an (H*T[+hud], W*T, 3) uint8
    RGB array."""
    rows = spec.terrain_chars
    height, width = len(rows), len(rows[0])
    hud_h = TILE // 2 if hud else 0
    img = Image.new("RGB", (width * TILE, height * TILE + hud_h), COLORS["floor"])
    draw = ImageDraw.Draw(img)

    for y, row in enumerate(rows):
        for x, c in enumerate(row):
            x0, y0 = x * TILE, y * TILE + hud_h
            draw.rectangle(
                [x0, y0, x0 + TILE - 1, y0 + TILE - 1],
                fill=COLORS[TERRAIN_FILL[c]],
                outline=(25, 25, 30),
            )
            if c in TERRAIN_GLYPH:
                draw.text(
                    (x0 + 4, y0 + 2), TERRAIN_GLYPH[c], fill=COLORS["text"]
                )

    # loose / pot objects
    for obj in state_dict.get("objects", []):
        x, y = obj["position"]
        cx, cy = x * TILE + TILE // 2, y * TILE + TILE // 2 + hud_h
        if obj["name"] == "soup":
            _draw_object(draw, cx, cy, _soup_color(obj), r=TILE // 4)
            n = len(obj.get("_ingredients", []))
            tick = obj.get("cooking_tick", -1)
            label = f"{n}" if tick < 0 else f"{tick}"
            draw.text((cx - 4, cy - 7), label, fill=(20, 20, 20))
        else:
            _draw_object(draw, cx, cy, obj["name"])

    # players with orientation wedge + held object
    arrow = {(0, -1): (0, -1), (0, 1): (0, 1), (1, 0): (1, 0), (-1, 0): (-1, 0)}
    for i, p in enumerate(state_dict["players"]):
        x, y = p["position"]
        cx, cy = x * TILE + TILE // 2, y * TILE + TILE // 2 + hud_h
        color = COLORS[f"player{i % 4}"]
        r = TILE // 3
        draw.ellipse([cx - r, cy - r, cx + r, cy + r], fill=color)
        dx, dy = arrow[tuple(p["orientation"])]
        draw.line(
            [cx, cy, cx + dx * r, cy + dy * r], fill=(20, 20, 25), width=3
        )
        held = p.get("held_object")
        if held:
            hx, hy = cx + dx * r, cy + dy * r
            if held["name"] == "soup":
                _draw_object(draw, hx, hy, "soup_ready", r=TILE // 6)
            else:
                _draw_object(draw, hx, hy, held["name"], r=TILE // 6)

    if hud:
        draw.text((4, 2), hud, fill=COLORS["text"])
    return np.asarray(img, np.uint8)


class StateVisualizer:
    """API-compatible veneer over render_state_rgb (reference
    state_visualizer.py:37,162,262)."""

    def __init__(self, **config):
        self.config = config

    def render_state(self, state, grid=None, hud_data=None, spec=None):
        assert spec is not None or grid is not None
        if spec is None:
            spec = _spec_from_grid(grid)
        hud = ""
        if hud_data:
            hud = "  ".join(f"{k}: {v}" for k, v in hud_data.items())
        state_dict = state if isinstance(state, dict) else state.to_dict()
        return render_state_rgb(spec, state_dict, hud)

    def display_rendered_trajectory(
        self, trajectories, trajectory_idx=0, spec=None, img_directory_path=None
    ):
        """Render every state of a trajectory; returns (or saves) frames."""
        states = trajectories["ep_states"][trajectory_idx]
        frames = [self.render_state(s, spec=spec) for s in states]
        if img_directory_path:
            import os

            os.makedirs(img_directory_path, exist_ok=True)
            for i, fr in enumerate(frames):
                Image.fromarray(fr).save(
                    os.path.join(img_directory_path, f"{i}.png")
                )
        return frames


def _spec_from_grid(grid):
    from overcooked_ai_tpu.core.layout import build_layout

    rows = grid if isinstance(grid[0], str) else ["".join(r) for r in grid]

    class _MiniSpec:
        terrain_chars = rows

    return _MiniSpec()
