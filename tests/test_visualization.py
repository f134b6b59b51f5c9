"""Visualization parity features (reference testing/visualization_test.py +
state_visualizer.py:37-314): HUD with recipe icons, action-prob arrows,
trajectory rendering."""

import numpy as np

from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.interop.single_env import OvercookedEnv
from overcooked_ai_tpu.visualization.renderer import (
    TILE,
    StateVisualizer,
    render_state_rgb,
    show_trajectory_slider,
)


def _env_state(layout="cramped_room"):
    env = OvercookedEnv.from_layout_name(layout, horizon=400)
    return env.spec, env.state_dict()


def test_hud_data_renders_orders_and_text():
    spec, sd = _env_state()
    hud = {
        "all_orders": [{"ingredients": ["onion", "onion", "onion"]}],
        "score": 42,
        "time_left": 37,
    }
    img = render_state_rgb(spec, sd, hud_data=hud)
    plain = render_state_rgb(spec, sd)
    # HUD adds 24px per line above the grid
    assert img.shape[0] == plain.shape[0] + 4 + 24 * len(hud)
    assert img.shape[1] == plain.shape[1] == spec.width * TILE
    # the HUD strip is not all-background (text + icons drawn)
    hud_strip = img[: 4 + 24 * 3]
    assert len(np.unique(hud_strip.reshape(-1, 3), axis=0)) > 2


def test_action_prob_arrows_change_pixels():
    spec, sd = _env_state()
    probs = [
        [0.7, 0.1, 0.1, 0.05, 0.03, 0.02],
        [0.0, 0.0, 0.0, 0.0, 0.5, 0.5],
    ]
    with_arrows = render_state_rgb(spec, sd, action_probs=probs)
    without = render_state_rgb(spec, sd)
    assert with_arrows.shape == without.shape
    assert (with_arrows != without).any()
    # near-zero probs draw nothing
    tiny = [[0.0] * 6, [0.0] * 6]
    none_drawn = render_state_rgb(spec, sd, action_probs=tiny)
    np.testing.assert_array_equal(none_drawn, without)


def test_visualizer_trajectory_with_probs(tmp_path):
    spec, sd = _env_state()
    viz = StateVisualizer()
    traj = {"ep_states": [[sd, sd, sd]]}
    probs = [[[1 / 6] * 6] * 2] * 3  # [t][player][action]
    frames = viz.display_rendered_trajectory(
        traj,
        spec=spec,
        img_directory_path=str(tmp_path),
        hud_data_list=[{"score": t} for t in range(3)],
        action_probs=probs,
    )
    assert len(frames) == 3
    assert (tmp_path / "2.png").exists()


def test_slider_degrades_without_ipywidgets():
    spec, sd = _env_state()
    frame = render_state_rgb(spec, sd)
    # returns a widget in notebooks; None (with a message) elsewhere
    out = show_trajectory_slider([frame])
    assert out is None or hasattr(out, "children")
