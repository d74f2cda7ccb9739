"""Checkpoint save/restore via orbax (reference: Lightning ModelCheckpoint
+ the two non-strict load paths, ``main.py:82-88,130-135`` and
``model_wrapper.py:208-225``).

Supports step-based retention and *partial / non-strict* restore: params
whose shapes changed (or are missing) keep their freshly initialized
values, mirroring the reference's checkpoint surgery that drops mismatched
tensors and discards optimizer state on change.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(directory: str, step: int, state: dict) -> None:
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)  # overwrite an existing step dir
    ckptr.wait_until_finished()


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(
    directory: str, step: int, reference_state: dict, strict: bool = True
) -> dict:
    """Restore; with strict=False, keep reference values on mismatch."""
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    if strict:
        return ckptr.restore(path, reference_state)
    # Non-strict: restore the raw saved tree, then graft leaves whose
    # (path, shape, dtype) match onto the reference state.  Handles dicts,
    # tuples/lists, and optax NamedTuple states uniformly via keypaths.
    restored = ckptr.restore(path)

    def path_str(kp) -> str:
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            elif hasattr(k, "name"):
                parts.append(str(k.name))
            else:
                parts.append(str(k))
        return "/".join(parts)

    new_leaves = {
        path_str(kp): leaf
        for kp, leaf in jax.tree_util.tree_flatten_with_path(restored)[0]
    }

    def graft_leaf(kp, ref_leaf):
        key = path_str(kp)
        if key not in new_leaves:
            return ref_leaf
        new_arr = np.asarray(new_leaves[key])
        ref_arr = np.asarray(ref_leaf)
        if new_arr.shape == ref_arr.shape and new_arr.dtype == ref_arr.dtype:
            return jax.numpy.asarray(new_arr)
        return ref_leaf

    grafted = jax.tree_util.tree_map_with_path(graft_leaf, reference_state)
    # Dropping/reshaping params invalidates optimizer state (reference
    # drops optimizer_states on change) — keep the reference's fresh one.
    if isinstance(grafted, dict) and "opt_state" in reference_state:
        grafted["opt_state"] = reference_state["opt_state"]
    return grafted
