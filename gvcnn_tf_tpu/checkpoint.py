"""Checkpoint / resume via Orbax (replaces reference tf.train.Saver flow).

Reference behavior (SURVEY.md C8): `Saver.save/restore` inside train.py plus
slim `assign_from_checkpoint_fn(pretrained, checkpoint_exclude_scopes)` for
ImageNet warm-start.  Here: async Orbax checkpointing with auto-resume from
the latest step, and `warm_start` replicating the exclude-scopes semantics
on a params pytree.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    """Thin async CheckpointManager wrapper keyed by step."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        return self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of `target` (a concrete state pytree)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def restore_partial(self, target: Any, step: Optional[int] = None) -> Any:
        """Restore a SUBTREE of a saved state (e.g. params+batch_stats only).

        Eval/predict use this so a checkpoint written by any optimizer can
        be read without rebuilding its opt_state structure (the reference's
        Saver.restore(var_list) equivalent).

        Also accepts a RAW (step-less) checkpoint directory — one written
        directly by ocp.StandardCheckpointer, e.g. an older
        import_slim_checkpoint output — by falling back to a direct PyTree
        restore when no step subdirectories exist.
        """
        if step is None:
            step = self.latest_step()
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        if step is None:
            try:
                with ocp.PyTreeCheckpointer() as ckptr:
                    return ckptr.restore(
                        self.directory,
                        args=ocp.args.PyTreeRestore(
                            item=abstract, partial_restore=True
                        ),
                    )
            except Exception as e:
                raise FileNotFoundError(
                    f"no step checkpoints under {self.directory} and the "
                    f"directory is not a raw checkpoint either ({e})"
                ) from None
        return self._mgr.restore(
            step,
            args=ocp.args.PyTreeRestore(item=abstract, partial_restore=True),
        )

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def warm_start(
    init_params: Any,
    pretrained_params: Any,
    exclude_scopes: Sequence[str] = (),
) -> Any:
    """slim `assign_from_checkpoint_fn` semantics on Flax param dicts.

    Copies every top-level module subtree present in `pretrained_params`
    into `init_params`, skipping scopes whose name starts with any entry of
    `exclude_scopes` (reference `checkpoint_exclude_scopes` flag, SURVEY.md
    C8).  Shape-mismatched leaves raise — same failure mode as the
    reference's assign ops.
    """
    out = dict(init_params)
    for scope, sub in pretrained_params.items():
        if any(scope.startswith(e) for e in exclude_scopes):
            continue
        if scope not in out:
            continue
        ref_shapes = jax.tree.map(lambda x: x.shape, out[scope])
        new_shapes = jax.tree.map(lambda x: x.shape, sub)
        if ref_shapes != new_shapes:
            raise ValueError(
                f"warm-start shape mismatch in scope {scope!r}: "
                f"{new_shapes} vs {ref_shapes}"
            )
        out[scope] = sub
    return out
