"""Checkpoint / resume — a capability the reference entirely lacks (it never saves
weights; the trained generator only survives as an in-memory return value,
README.md:935 / SURVEY.md §5).

Orbax-based: saves the full TrainState pytree (params of both nets, BN stats,
spectral (u, v), optimizer states, step counter) every N steps, keeps the last K,
restores onto the current sharding.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from vaegan_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, state: TrainState, *, force: bool = False) -> None:
        """Persist ``state`` under its step number.

        ``force=True`` means OVERWRITE an existing step (orbax's own ``force``
        kwarg does not — it still raises StepAlreadyExistsError): cmd_import
        re-imports into an existing dir, where a silent keep-the-old-weights
        no-op would serve stale parameters. Without force, an
        already-persisted step is a no-op (e.g. the loop's final save landing
        on a step the periodic save already wrote)."""
        step = int(jax.device_get(state.step))
        if step in (self._mgr.all_steps() or []):
            if not force:
                return
            self._mgr.delete(step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, template: TrainState, step: Optional[int] = None) -> TrainState:
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def saved_has_g_ema(self, step: Optional[int] = None) -> Optional[bool]:
        """Whether the saved TrainState carries a generator-EMA leaf — lets
        callers build a structurally matching restore template regardless of
        the *current* config's ``ema_decay`` (a checkpoint knows what it was
        trained with better than the flags of the restoring process).

        Returns ``None`` when the question cannot be answered (no checkpoint,
        or an orbax on-disk metadata layout this probe doesn't recognize —
        the fallback below reads orbax's private ``_METADATA`` schema, which
        an orbax upgrade may change). Callers treat ``None`` as "trust the
        current flags" rather than silently assuming no-EMA."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        md = self._mgr.item_metadata(step)
        tree = getattr(md, "tree", None) if md is not None else None
        if tree is not None:
            return tree.get("g_ema") is not None
        # a manager that hasn't saved/restored this run yet returns None above;
        # the tree metadata JSON orbax writes alongside the arrays still knows
        import json

        p = os.path.join(self.directory, str(step), "default", "_METADATA")
        try:
            with open(p) as f:
                tm = json.load(f)["tree_metadata"]
            for entry in tm.values():
                keys = [k.get("key") for k in entry.get("key_metadata", [])]
                if keys and keys[0] == "g_ema":
                    return entry["value_metadata"]["value_type"] != "None"
            return False  # schema understood, no g_ema entry at all
        except (OSError, KeyError, ValueError, TypeError, AttributeError):
            return None  # unrecognized layout — undeterminable, not "no EMA"

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
