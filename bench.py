"""Headline benchmark: env-steps/s at 16k batched envs on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >=50M env-steps/s aggregate on 1 host at 16k
vmapped envs; vs_baseline is value / 50e6.
"""

import json
import time

import jax
import jax.numpy as jnp

from overcooked_ai_tpu.core.env import batch_reset, rollout_random
from overcooked_ai_tpu.core.layout import from_layout_name

BASELINE_STEPS_PER_SEC = 50e6
BATCH = 16384
NUM_STEPS = 400


def main():
    spec = from_layout_name("cramped_room")
    layout = jax.tree.map(jnp.asarray, spec.layout)
    state = batch_reset(layout, BATCH)

    # compile + warmup; int() materializes the result -- block_until_ready
    # alone is not a reliable fence over the axon remote-TPU tunnel
    fs, total = rollout_random(layout, state, jax.random.PRNGKey(0), NUM_STEPS)
    int(total)

    times = []
    for r in range(5):
        t0 = time.perf_counter()
        fs, total = rollout_random(
            layout, fs, jax.random.PRNGKey(r + 1), NUM_STEPS
        )
        int(total)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

    steps_per_sec = BATCH * NUM_STEPS / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_16k_envs_1chip",
                "value": round(steps_per_sec),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
