"""Offline data tools: VKITTI GT-normal generation (discontinuity-aware gradients +
MRF refinement) and Hypersim preprocessing (tone mapping, distance->planar depth)."""
