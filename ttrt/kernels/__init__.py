"""Pallas TPU kernels — the hand-tiled hot paths of the renderer."""
