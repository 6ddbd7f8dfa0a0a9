"""Scenario-parallel scale-out over TPU meshes (DP over ICI/DCN)."""
