"""Checkpoint / resume for long computations.

Parity reference: the reference has *no* computation checkpointing (long
runs restart from scratch; SURVEY.md section 5) — only XML serialization
of workspace variables.  Here: orbax-backed pytree checkpointing for
retrieval iterations and sweep progress, so a host restart resumes
mid-sweep (the "failure tolerance" subsystem the TPU deployment needs).
"""

import dataclasses
import pathlib
from typing import Any, Optional

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class SweepCheckpointer:
    """Checkpoints (step, pytree state) for an indexed sweep.

    Uses orbax when available, .npz fallback otherwise; either way the
    on-disk layout is a directory with one entry per saved step.
    """

    def __init__(self, directory):
        self.dir = pathlib.Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        try:
            import orbax.checkpoint as ocp

            self._mgr = ocp.CheckpointManager(
                self.dir / "orbax",
                options=ocp.CheckpointManagerOptions(max_to_keep=3),
            )
        except Exception:
            self._mgr = None

    def save(self, step: int, state: Any):
        if self._mgr is not None:
            import orbax.checkpoint as ocp

            self._mgr.save(step, args=ocp.args.StandardSave(_to_numpy_tree(state)))
            self._mgr.wait_until_finished()
        else:
            leaves, treedef = jax.tree_util.tree_flatten(_to_numpy_tree(state))
            np.savez(
                self.dir / f"step_{step:08d}.npz",
                **{f"leaf_{i}": l for i, l in enumerate(leaves)},
            )

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        files = sorted(self.dir.glob("step_*.npz"))
        return int(files[-1].stem.split("_")[1]) if files else None

    def restore(self, step: int, like: Any):
        """Restore into the structure of `like`."""
        if self._mgr is not None:
            import orbax.checkpoint as ocp

            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(_to_numpy_tree(like))
            )
        data = np.load(self.dir / f"step_{step:08d}.npz")
        leaves, treedef = jax.tree_util.tree_flatten(like)
        new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
        return jax.tree_util.tree_unflatten(treedef, new_leaves)


def checkpointed_sweep(step_fn, n_steps: int, checkpointer, init_state):
    """Run state = step_fn(state, step) for step 0..n_steps-1 with a save
    after every step, resuming from the latest checkpoint when one exists.

    The failure-tolerance loop the reference lacks (SURVEY.md section 5:
    long ARTS runs restart from scratch): a killed process re-enters here,
    restores the last completed step's state, and continues — the resumed
    sweep is bit-identical to an uninterrupted one because each step sees
    exactly the same (state, step) inputs.
    """
    state = init_state
    start = 0
    latest = checkpointer.latest_step()
    if latest is not None:
        state = checkpointer.restore(latest, init_state)
        start = latest + 1
    for step in range(start, n_steps):
        state = step_fn(state, step)
        checkpointer.save(step, state)
    return state
