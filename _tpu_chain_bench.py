import time, jax, jax.numpy as jnp
from overcooked_ai_tpu.core.env import batch_reset
from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.ops.fused_rollout import fused_rollout_random
spec = from_layout_name("cramped_room")
layout = jax.tree.map(jnp.asarray, spec.layout)
B = 16384
state = batch_reset(layout, B)
for T in [100, 400]:
    fs, ret = fused_rollout_random(spec, state, seed=0, num_steps=T, block_b=2048)
    int(ret.sum())  # warm
    for chain in [1, 10]:
        t0 = time.perf_counter()
        fs = state
        for r in range(chain):
            fs, ret = fused_rollout_random(spec, fs, seed=r+1, num_steps=T, block_b=2048)
        int(ret.sum())
        dt = time.perf_counter() - t0
        print(f"T={T} chain={chain}: {dt*1000:.1f}ms total, {B*T*chain/dt/1e6:.1f}M steps/s", flush=True)
