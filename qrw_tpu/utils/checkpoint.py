"""Checkpoint / resume for rollout and controller state pytrees.

The reference's nearest analogs are the timestamped full-run .npz dumps
+ symmetric loadAll (scripts/LoggerControl.py:551-714) and the
per-cycle solver-input capture of crocoddyl_eval
(scripts/crocoddyl_eval/test_1/run_scenarios.py:55-66). Here any state
pytree (RolloutCarry, ControllerState, solver warm starts) round-trips
through one .npz keyed by tree path, so a long batched rollout can be
cut, stored, and resumed bit-exactly — the training-style checkpointing
the reference lacks (SURVEY.md section 5.4)."""

from __future__ import annotations

import jax
import numpy as np


def _path_key(path) -> str:
    out = []
    for p in path:
        if hasattr(p, "name"):
            out.append(str(p.name))
        elif hasattr(p, "idx"):
            out.append(str(p.idx))
        elif hasattr(p, "key"):
            out.append(str(p.key))
        else:  # pragma: no cover
            out.append(str(p))
    return "/".join(out)


def save_state(path: str, tree) -> str:
    """Serialize a pytree of arrays to `path` (.npz), keyed by tree path."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    data = {}
    for p, leaf in leaves:
        data[_path_key(p)] = np.asarray(leaf)
    np.savez_compressed(path, **data)
    return path


def load_state(path: str, template):
    """Rebuild a pytree from a checkpoint, using `template` for structure
    and dtypes (leaves are cast to the template leaf dtype)."""
    with np.load(path, allow_pickle=False) as f:
        stored = {k: f[k] for k in f.files}
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, t_leaf in paths:
        key = _path_key(p)
        if key not in stored:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = stored[key]
        leaves.append(jax.numpy.asarray(arr, dtype=t_leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)
