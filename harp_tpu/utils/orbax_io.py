"""Orbax-backed async checkpointing (SURVEY.md §5 elastic-recovery answer).

Complements the pickle checkpoints in harp_tpu.utils.io with the
production-grade path: async device-to-host transfer + background write, so
the training loop never blocks on storage, atomic finalization, retention
of the last N checkpoints, and multi-host coordination for free when
running under jax.distributed (Orbax serializes per-shard).

Payload layout matches io.save_checkpoint: a pytree
{params, opt_states, epoch, plateau_scale, extra} — `restore` returns the
same dict shape so resume code is backend-agnostic.

The reference has neither: a crash there loses up to 200 epochs
(optimize_sequence.py:591-596 saves a bare pickle every 200).
"""

from __future__ import annotations

import os

import jax
import numpy as np


class OrbaxCheckpointer:
    """Async checkpoint manager over a directory of step-numbered saves.

    Usage:
        ckpt = OrbaxCheckpointer(out_dir, max_to_keep=3)
        ckpt.save(epoch, params, opt_states, plateau_scale)   # non-blocking
        ...
        ckpt.wait()       # barrier (e.g. before final eval)
        payload = ckpt.restore()          # latest, or restore(step=...)
        ckpt.close()
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(os.path.join(directory, "orbax"))
        os.makedirs(self.directory, exist_ok=True)
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self.manager = ocp.CheckpointManager(self.directory, options=opts)

    def save(self, step: int, params: dict, opt_states, plateau_scale: float = 1.0,
             extra: dict | None = None) -> None:
        payload = {
            "params": params,
            "opt_states": opt_states,
            "epoch": step,
            "plateau_scale": float(plateau_scale),
            "extra": extra or {},
        }
        self.manager.save(
            step, args=self._ocp.args.StandardSave(payload)
        )

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, step: int | None = None, like: dict | None = None) -> dict:
        """Restore a payload. Pass `like` (e.g. a freshly-initialized
        {params, opt_states, ...} of the same structure) to get custom
        pytree nodes (optax named-tuple states) back with their original
        structure; without it, nested containers come back as dicts/lists.
        """
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no orbax checkpoints in {self.directory}")
        if like is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
                like,
            )
            payload = self.manager.restore(
                step, args=self._ocp.args.StandardRestore(abstract)
            )
        else:
            payload = self.manager.restore(step)
        import jax.numpy as jnp

        payload["params"] = jax.tree.map(jnp.asarray, payload["params"])
        payload["opt_states"] = jax.tree.map(jnp.asarray, payload["opt_states"])
        return payload

    def close(self) -> None:
        self.manager.wait_until_finished()
        self.manager.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
