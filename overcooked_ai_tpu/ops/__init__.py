"""Pallas TPU kernels for the hot ops.

XLA handles the general step/featurize path well; these kernels exist where
fusion across *time* matters -- keeping environment state resident in VMEM
across a whole horizon scan instead of round-tripping HBM every step.

Modules: `fused_rollout` (whole-horizon, one layout), `fused_train`
(single training step: transition + events + shaped rewards + lossless
encoding), `fused_pool` (dynamic-terrain twins of both for the
variable-MDP layout-pool mode: per-lane layouts as packed operands).
"""
