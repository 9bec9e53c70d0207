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


def save_checkpoint(path: str, params, opt_state=None, iteration: int = 0,
                    extra: dict | None = None) -> None:
    """Write a portable checkpoint: params (+ optional optimizer state) and
    the iteration counter.  The pytree structure is recorded in meta.json so
    `restore_checkpoint` can reject a structurally mismatched checkpoint."""
    os.makedirs(path, exist_ok=True)
    meta = {"iteration": int(iteration)}
    for name, tree in (("params", params), ("opt_state", opt_state)):
        if tree is None:
            continue
        leaves, treedef = jax.tree.flatten(tree)
        np.savez(os.path.join(path, f"{name}.npz"),
                 **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
        meta[f"{name}_treedef"] = str(treedef)
        meta[f"{name}_shapes"] = [list(np.shape(x)) for x in leaves]
    if extra:
        meta.update(extra)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def has_checkpoint(path: str | None) -> bool:
    return (path is not None
            and os.path.exists(os.path.join(path, "params.npz"))
            and os.path.exists(os.path.join(path, "meta.json")))


def restore_checkpoint(path: str, params_like, opt_state_like=None):
    """Restore into the structure of `params_like` (and `opt_state_like`).

    Leaf counts, shapes, and the recorded treedef must match exactly — a
    genuinely mismatched checkpoint raises instead of being silently
    cast/reshaped into the wrong structure.  Returns
    (params, opt_state, iteration)."""

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)

    def _restore(name, like):
        data = np.load(os.path.join(path, f"{name}.npz"))
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
        like_leaves, treedef = jax.tree.flatten(like)
        if len(leaves) != len(like_leaves):
            raise ValueError(
                f"checkpoint {name} has {len(leaves)} leaves, expected "
                f"{len(like_leaves)}")
        saved_td = meta.get(f"{name}_treedef")
        if saved_td is not None and saved_td != str(treedef):
            raise ValueError(
                f"checkpoint {name} pytree structure does not match the "
                f"restore target:\n  saved: {saved_td}\n  want:  {treedef}")
        for i, (x, l) in enumerate(zip(leaves, like_leaves)):
            if np.shape(x) != np.shape(l):
                raise ValueError(
                    f"checkpoint {name} leaf {i} has shape {np.shape(x)}, "
                    f"expected {np.shape(l)}")
        leaves = [np.asarray(x).astype(np.asarray(l).dtype)
                  for x, l in zip(leaves, like_leaves)]
        return jax.tree.unflatten(treedef, leaves)

    params = _restore("params", params_like)
    opt_state = None
    if opt_state_like is not None and \
            os.path.exists(os.path.join(path, "opt_state.npz")):
        opt_state = _restore("opt_state", opt_state_like)
    return params, opt_state, meta.get("iteration", 0)
