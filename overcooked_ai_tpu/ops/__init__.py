"""Pallas TPU kernels for the hot ops.

XLA handles the general step/featurize path well; these kernels exist where
fusion across *time* matters -- keeping environment state resident in VMEM
across a whole horizon scan instead of round-tripping HBM every step.
"""
