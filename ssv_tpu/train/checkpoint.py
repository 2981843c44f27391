"""Full-state Orbax checkpointing.

The reference saves only model params, only on new-best KNN, and its load
path is broken for 9 of 11 trainers (checks a never-created `encoder` path —
simclr.py:69 etc., SURVEY §2b). Here a checkpoint is the complete TrainState
pytree — params, optimizer state, BN stats, EMA twins, queues/banks/centers,
pseudo-labels and the step counter — so resume is exact.
"""

from __future__ import annotations

import os

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_state(path: str, state) -> None:
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def restore_state(path: str, template):
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else x,
        template)
    return ckptr.restore(path, abstract)
