"""Chunked rollout (VMEM-sized sub-batch scans) matches per-chunk runs.

`rollout_random(chunk_size=...)` splits the minor env-batch axis and runs
each sub-batch's full horizon scan sequentially; results must be identical
to running each sub-batch independently with the same per-chunk keys.
"""

import jax
import jax.numpy as jnp
import numpy as np

from overcooked_ai_tpu.core.env import batch_reset, rollout_random
from overcooked_ai_tpu.core.layout import from_layout_name


def test_chunked_rollout_matches_per_chunk_runs():
    spec = from_layout_name("cramped_room")
    layout = jax.tree.map(jnp.asarray, spec.layout)
    batch, chunk = 64, 16
    state = batch_reset(layout, batch)
    key = jax.random.PRNGKey(7)

    fs_chunked, total_chunked = rollout_random(
        layout, state, key, 50, chunk_size=chunk
    )

    # reference: run each sub-batch independently with the same derived keys
    chunk_keys = jax.random.split(key, batch // chunk)
    totals = []
    finals = []
    for c, ck in enumerate(chunk_keys):
        sub = jax.tree.map(lambda x: x[..., c * chunk : (c + 1) * chunk], state)
        fs, tot = rollout_random(layout, sub, ck, 50)
        totals.append(int(tot))
        finals.append(fs)

    assert int(total_chunked) == sum(totals)
    merged = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=-1), *finals)
    for got, want in zip(
        jax.tree.leaves(fs_chunked), jax.tree.leaves(merged)
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_chunk_size_none_and_full_batch_equivalent():
    spec = from_layout_name("cramped_room")
    layout = jax.tree.map(jnp.asarray, spec.layout)
    state = batch_reset(layout, 32)
    key = jax.random.PRNGKey(3)
    fs_a, tot_a = rollout_random(layout, state, key, 40)
    fs_b, tot_b = rollout_random(layout, state, key, 40, chunk_size=32)
    assert int(tot_a) == int(tot_b)
    for a, b in zip(jax.tree.leaves(fs_a), jax.tree.leaves(fs_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
