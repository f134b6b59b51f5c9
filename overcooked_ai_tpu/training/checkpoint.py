"""Checkpoint / resume and metrics logging.

Replaces the reference's three mechanisms (RLlib trainer checkpoints with
dill'd configs, reference rllib/rllib.py:788-854; keras .keras files;
planner pickles) with one orbax checkpointer for learner state and JSON
for configs. Metrics go to a JSONL file (the reference pushes rllib custom
metrics to TensorBoard, rllib.py:453-483).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from overcooked_ai_tpu.training.ppo import PPOConfig, TrainState


def save_checkpoint(ckpt_dir, ts: TrainState, config: PPOConfig, step: int,
                    extra=None):
    """Save a training checkpoint (orbax) + config (JSON). `extra` merges
    additional JSON metadata (e.g. {"use_lstm": True} so agent loaders can
    rebuild the right net family)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.join(ckpt_dir, f"step_{step}"),
            jax.device_get(ts),
            force=True,
        )
    cfg = dataclasses.asdict(config)
    cfg["net"] = dataclasses.asdict(config.net)
    cfg["bc_schedule"] = [list(p) for p in config.bc_schedule]
    with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
        json.dump(
            {"config": cfg, "latest_step": step, **(extra or {})},
            f, indent=1, default=str,
        )


def latest_step(ckpt_dir):
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        return json.load(f)["latest_step"]


def restore_checkpoint(ckpt_dir, ts_template: TrainState, step=None):
    """Restore a TrainState saved by save_checkpoint.

    ts_template: a freshly-initialized TrainState with matching shapes
    (e.g. from make_ppo's init_fn).
    """
    ckpt_dir = os.path.abspath(ckpt_dir)
    if step is None:
        step = latest_step(ckpt_dir)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.join(ckpt_dir, f"step_{step}"),
            jax.device_get(ts_template),
        )
    return jax.tree.map(jax.numpy.asarray, restored), step


class MetricsLogger:
    """Append-only JSONL metrics log, optionally mirrored to TensorBoard.

    The reference pushes rllib custom metrics to TensorBoard via
    UnifiedLogger (rllib.py:453-483,715-730); pass tensorboard=True to
    write TB event files next to the JSONL (torch's SummaryWriter, no
    TF dependency)."""

    def __init__(self, path, tensorboard=False):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._f = open(path, "a")
        self._tb = None
        if tensorboard:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(
                log_dir=os.path.join(os.path.dirname(os.path.abspath(path)), "tb")
            )

    def log(self, step, metrics):
        row = {"step": step}
        for k, v in (
            metrics._asdict() if hasattr(metrics, "_asdict") else metrics
        ).items():
            v = np.asarray(v)
            row[k] = v.item() if v.size == 1 else v.tolist()
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in row.items():
                if k != "step" and np.isscalar(v):
                    self._tb.add_scalar(k, v, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
