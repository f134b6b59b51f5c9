"""Opt-in full-scale learning tests (real TPU, ~5 min each).

Encode the known-good production results as regression thresholds
(VERDICT r1 weak #4): event-shaped PPO self-play on cramped_room reaches
~130 sparse/episode by 12M env steps at the reference production config
(measured on v5e, runs/shaped_r2_long). Run with:

    OVERCOOKED_TPU_TESTS=1 python -m pytest tests/test_tpu_learning.py -q

(conftest.py forces the CPU backend unless OVERCOOKED_TEST_PLATFORM is
set; these tests are practical only on the real device.)
"""

import os

import numpy as np
import pytest

from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.training.ppo import PPOConfig, make_ppo_eval, train

TPU_TESTS = os.environ.get("OVERCOOKED_TPU_TESTS") == "1"

pytestmark = pytest.mark.skipif(
    not TPU_TESTS, reason="set OVERCOOKED_TPU_TESTS=1 (real-TPU, slow)"
)


def test_production_shaped_ppo_reaches_known_good_sparse():
    """Production config (30 envs x 400, lr 5e-5, event shaping): sparse
    reward must reach >=100/episode within 1200 iterations (14.4M steps) --
    the known-good curve hits ~126 by 1000 iters."""
    spec = from_layout_name("cramped_room")
    cfg = PPOConfig()  # reference production defaults
    ts, hist = train(spec, cfg, num_iterations=1200, seed=0)
    last100 = np.mean(
        [float(m.episode_sparse_reward) for m in hist[-100:]]
    )
    assert last100 >= 100, last100
    # shaping-free eval confirms the behavior is real, not reward hacking
    ev = make_ppo_eval(spec, cfg.net, num_games=16)
    import jax

    score = float(ev(ts.params, jax.random.PRNGKey(0)))
    assert score >= 80, score
