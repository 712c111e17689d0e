"""Portable serving artifacts: eval-mode entry points exported to StableHLO.

The reference's only deployment story is the in-memory ``generator`` returned
by ``experiment()`` (/root/reference/README.md:935) — the trained weights die
with the notebook kernel. This module gives the framework a real serving path:
``jax.export`` the jitted eval-mode functions (reconstruct / encode / decode)
with the trained weights baked in as constants, serialize each to a
self-contained StableHLO artifact, and reload + call them on any host with
only ``jax`` installed — no flax, no model code, no checkpoint plumbing.

Design points (TPU-first):

- artifacts are exported for BOTH ``cpu`` and ``tpu`` by default, so the same
  file serves on a TPU host and in a CPU smoke test / CI;
- the batch dimension is symbolic (``jax.export.symbolic_shape``) — one
  artifact serves any request batch size; H/W stay static so XLA keeps its
  tiled conv schedules;
- eval-mode semantics are frozen in (BN running stats, dropout off,
  deterministic z = mu — README.md:1217-1218), so a served model cannot
  accidentally run train-mode stochastic paths;
- a JSON manifest records shapes, dtypes and the full resolved config so a
  serving host can validate requests without importing the framework.

Bundle layout (``save_bundle``)::

    out_dir/
      manifest.json           # shapes, dtypes, platforms, resolved config
      reconstruct.stablehlo   # (b, H, W, C)  -> ((b, H, W, C), scalar MSE)
      encode.stablehlo        # (b, H, W, C)  -> (b, h, w, latent)
      decode.stablehlo        # (b, h, w, latent) -> (b, H, W, C)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from vaegan_tpu.config import Config
from vaegan_tpu.inference import _gen_vars, eval_reconstruct, latent_shape
from vaegan_tpu.train.state import TrainState, build_models

MANIFEST_NAME = "manifest.json"
_ARTIFACT_SUFFIX = ".stablehlo"
# bump when the bundle layout / calling convention changes
BUNDLE_VERSION = 1


def _entry_fns(cfg: Config, state: TrainState) -> Dict[str, Callable]:
    """The three eval-mode entry points, with weights closed over (they become
    constants in the exported module — the artifact is self-contained).

    Models are built with Pallas fusion OFF: a bundle must lower for every
    target platform (default cpu+tpu), and Mosaic kernels have no CPU
    lowering. Eval-mode fused BN runs at dropout p=0, so the unfused graph is
    mathematically identical — the toggle only ever affected training-step
    throughput."""
    cfg = cfg.replace(train=cfg.train.replace(use_pallas="off"))
    gen, _ = build_models(cfg)
    gvars = _gen_vars(state)

    def reconstruct(batch):
        return eval_reconstruct(cfg, gen, gvars, batch)

    def encode(batch):
        return gen.apply(gvars, batch, train=False, method=gen.encode)

    def decode(z):
        return gen.apply(gvars, z, train=False, method=gen.decode)

    return {"reconstruct": reconstruct, "encode": encode, "decode": decode}


def export_entries(
    cfg: Config,
    state: TrainState,
    *,
    image_size: Optional[int] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
    batch_size: Optional[int] = None,
) -> Dict[str, jax_export.Exported]:
    """Export reconstruct/encode/decode as ``jax.export.Exported`` objects.

    ``batch_size=None`` (default) exports with a symbolic batch dimension —
    the artifact accepts any batch size at call time. Pass a concrete int to
    pin it (slightly tighter XLA schedules for a known serving batch).
    """
    size = image_size or cfg.data.image_size
    h, w, c = latent_shape(cfg, size)
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = int(batch_size)
    img_spec = jax.ShapeDtypeStruct((b, size, size, cfg.generator.in_channels),
                                    jnp.float32)
    lat_spec = jax.ShapeDtypeStruct((b, h, w, c), jnp.float32)
    fns = _entry_fns(cfg, state)
    specs = {"reconstruct": img_spec, "encode": img_spec, "decode": lat_spec}
    return {
        name: jax_export.export(jax.jit(fn), platforms=tuple(platforms))(specs[name])
        for name, fn in fns.items()
    }


def save_bundle(
    out_dir: str,
    cfg: Config,
    state: TrainState,
    *,
    image_size: Optional[int] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
    batch_size: Optional[int] = None,
) -> str:
    """Export + write a serving bundle; returns the manifest path."""
    os.makedirs(out_dir, exist_ok=True)
    exported = export_entries(cfg, state, image_size=image_size,
                              platforms=platforms, batch_size=batch_size)
    entries = {}
    for name, exp in exported.items():
        fname = name + _ARTIFACT_SUFFIX
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exp.serialize())
        entries[name] = {
            "file": fname,
            # symbolic batch dims serialize as their expression string ("b")
            "in_shapes": [[d if isinstance(d, int) else str(d) for d in a.shape]
                          for a in exp.in_avals],
            "in_dtypes": [str(a.dtype) for a in exp.in_avals],
            "out_shapes": [[d if isinstance(d, int) else str(d) for d in a.shape]
                           for a in exp.out_avals],
        }
    size = image_size or cfg.data.image_size
    manifest = {
        "bundle_version": BUNDLE_VERSION,
        "platforms": list(platforms),
        "batch": "symbolic" if batch_size is None else int(batch_size),
        "image_size": size,
        "channels": cfg.generator.in_channels,
        "latent_shape": list(latent_shape(cfg, size)),
        "step": int(jax.device_get(state.step)),
        "entries": entries,
        "config": cfg.to_dict(),
    }
    mpath = os.path.join(out_dir, MANIFEST_NAME)
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=2)
    return mpath


@dataclass(frozen=True)
class ServingBundle:
    """Loaded bundle: ``bundle.reconstruct(batch)``, ``.encode(batch)``,
    ``.decode(z)``. Needs only jax — deserialized StableHLO, no model code."""

    manifest: dict
    _calls: Dict[str, Callable]

    @property
    def image_size(self) -> int:
        return int(self.manifest["image_size"])

    @property
    def latent_shape(self) -> Tuple[int, int, int]:
        return tuple(self.manifest["latent_shape"])

    def reconstruct(self, batch) -> Tuple[jax.Array, jax.Array]:
        return self._calls["reconstruct"](batch)

    def encode(self, batch) -> jax.Array:
        return self._calls["encode"](batch)

    def decode(self, z) -> jax.Array:
        return self._calls["decode"](z)


def load_bundle(bundle_dir: str) -> ServingBundle:
    mpath = os.path.join(bundle_dir, MANIFEST_NAME)
    with open(mpath) as f:
        manifest = json.load(f)
    if manifest.get("bundle_version", 0) > BUNDLE_VERSION:
        raise ValueError(
            f"bundle at {bundle_dir} has version {manifest['bundle_version']}; "
            f"this runtime supports <= {BUNDLE_VERSION}")
    calls = {}
    for name, entry in manifest["entries"].items():
        with open(os.path.join(bundle_dir, entry["file"]), "rb") as f:
            calls[name] = jax_export.deserialize(f.read()).call
    return ServingBundle(manifest=manifest, _calls=calls)
