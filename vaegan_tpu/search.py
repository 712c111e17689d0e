"""Hyperparameter random search (reference C16, README.md:1013-1198 — shipped there
only as a commented-out HTML block; implemented here as a working subsystem).

Faithful to the reference's scheme:
- random configs over depth / length / lr / loss-weight / n_critics / critic-shape
  grids with monotonicity filters (the reference's ``check_ascending`` — critic
  feature lists must ascend, stride lists must be non-descending);
- dedup against a persistent ``result/params.json`` registry
  (``check_already_done`` / ``register_in_json``);
- each trial runs a (short) experiment and archives the last sample grid under a
  UUID (``result/archive/<uuid>.png``);
- failed trials (OOM / runtime errors) are caught and recorded — the reference's
  ``except OutOfMemoryError or RuntimeError`` bug (README.md:1193) only caught the
  first class; here both (and XLA aborts) are handled.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from vaegan_tpu.config import Config, DiscriminatorConfig, GeneratorConfig

# the reference's search grids (README.md:1028-1060)
SEARCH_SPACE: Dict[str, List[Any]] = {
    "network_depth": [1, 2, 3],
    "network_length": [1, 2],
    "feature_size": [32, 64],
    "lr": [1e-4, 3e-4, 1e-3],
    "adversarial_loss_weight": [0.0, 0.5, 1.0],
    "reconstruction_loss_weight": [5.0, 10.0],
    "kl_weight": [0.01, 0.1],
    "n_critics": [1, 3, 5],
    "num_stride_conv1": [1, 2],
    "num_features_conv1": [32, 64],
    "num_blocks": [[1, 1, 1], [2, 2, 2], [1, 1]],
    "num_strides_res": [[1, 2, 2], [2, 2, 2], [1, 2]],
    "num_features_res": [[64, 128, 256], [128, 256, 512], [64, 128]],
}


def check_ascending(seq) -> bool:
    return all(a <= b for a, b in zip(seq, seq[1:]))


def is_valid(params: Dict[str, Any]) -> bool:
    """Monotonicity / consistency filters (reference README.md:1062-1090 idea)."""
    nb, ns, nf = params["num_blocks"], params["num_strides_res"], params["num_features_res"]
    if not (len(nb) == len(ns) == len(nf)):
        return False
    if not check_ascending(nf):
        return False
    if not check_ascending(ns):
        return False
    return True


def make_random_params(rng: np.random.Generator) -> Dict[str, Any]:
    while True:
        params = {k: v[rng.integers(len(v))] for k, v in SEARCH_SPACE.items()}
        params = {k: (list(v) if isinstance(v, (list, tuple)) else v)
                  for k, v in params.items()}
        if is_valid(params):
            return params


def check_already_done(params: Dict[str, Any], results_path) -> bool:
    registry = _load_registry(results_path)
    key = json.dumps(params, sort_keys=True)
    return any(json.dumps(r.get("params", {}), sort_keys=True) == key for r in registry)


def _load_registry(results_path) -> List[Dict[str, Any]]:
    p = Path(results_path)
    if p.exists():
        with open(p) as f:
            return json.load(f)
    return []


def _locked_mutate(results_path, mutate) -> Any:
    """Run ``mutate(registry) -> result`` on the loaded registry under the
    sidecar flock, atomically replacing the file afterwards. The lock
    serializes concurrent searches (the natural way to use a multi-chip host)
    so read-modify-writes cannot silently drop each other's trials — the
    reference's ``register_in_json`` (README.md:1158-1168) had no locking
    (and never ran)."""
    import fcntl

    p = Path(results_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(str(p) + ".lock", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            registry = _load_registry(p)
            result = mutate(registry)
            tmp = p.with_suffix(f".tmp{os.getpid()}")
            with open(tmp, "w") as f:
                json.dump(registry, f, indent=2)
            os.replace(tmp, p)
            return result
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)


def register_in_json(entry: Dict[str, Any], results_path) -> None:
    """Append ``entry`` to the JSON registry, safely under concurrency."""
    _locked_mutate(results_path, lambda reg: reg.append(entry))


def register_if_new(entry: Dict[str, Any], results_path) -> bool:
    """Atomic dedup-and-reserve: append ``entry`` only if no registry entry
    has the same params; returns whether it was added. Checking and reserving
    under ONE lock closes the race where two concurrent searches (or a
    same-seed rerun) both pass a separate dedup check and run the identical
    trial twice."""
    key = json.dumps(entry.get("params", {}), sort_keys=True)

    def mutate(registry):
        if any(json.dumps(r.get("params", {}), sort_keys=True) == key
               for r in registry):
            return False
        registry.append(entry)
        return True

    return _locked_mutate(results_path, mutate)


def update_in_json(entry: Dict[str, Any], results_path) -> None:
    """Replace the registry entry with ``entry``'s id (append if missing)."""

    def mutate(registry):
        for i, r in enumerate(registry):
            if r.get("id") == entry.get("id"):
                registry[i] = entry
                return
        registry.append(entry)

    _locked_mutate(results_path, mutate)


def params_to_config(base: Config, params: Dict[str, Any]) -> Config:
    # replace(), not fresh dataclasses: the base config's non-searched fields
    # (in_channels, is_vae, res_mode, pool_size, linear_widths, feature_tap…)
    # must survive into every trial
    return base.replace(
        generator=base.generator.replace(
            depth=params["network_depth"], length=params["network_length"],
            feature_size=params["feature_size"]),
        discriminator=base.discriminator.replace(
            num_stride_conv1=params["num_stride_conv1"],
            num_features_conv1=params["num_features_conv1"],
            num_blocks=tuple(params["num_blocks"]),
            num_strides_res=tuple(params["num_strides_res"]),
            num_features_res=tuple(params["num_features_res"])),
        loss=base.loss.replace(
            adversarial_weight=params["adversarial_loss_weight"],
            reconstruction_weight=params["reconstruction_loss_weight"],
            kl_weight=params["kl_weight"]),
        optim=base.optim.replace(lr=params["lr"]),
        train=base.train.replace(n_critics=params["n_critics"]),
    )


def random_search(base: Config, n_trials: int, results_path="result/params.json",
                  archive_dir="result/archive", seed: int = 0,
                  max_steps_per_trial: Optional[int] = 200) -> List[Dict[str, Any]]:
    """Run ``n_trials`` random configurations; returns the registry entries added.

    ``max_steps_per_trial`` caps each trial's optimizer steps (via
    ``TrainConfig.max_steps``) so one expensive configuration cannot consume the
    whole search budget — the reference's search ran a full multi-epoch
    ``experiment()`` per trial (README.md:1177-1198). ``None`` = uncapped."""
    import jax

    from vaegan_tpu import inference
    from vaegan_tpu.data.pipeline import make_loader
    from vaegan_tpu.train.loop import train

    import shutil

    rng = np.random.default_rng(seed)
    Path(archive_dir).mkdir(parents=True, exist_ok=True)
    added = []
    trial, draws = 0, 0
    # a dedup hit resamples instead of consuming the trial budget (re-running
    # with the same seed against an existing registry must do NEW work, not
    # silently nothing); the draw cap bounds the loop when the whole filtered
    # space is already explored
    max_draws = max(50, 20 * n_trials)
    while trial < n_trials and draws < max_draws:
        draws += 1
        params = make_random_params(rng)
        run_id = str(uuid.uuid4())
        entry: Dict[str, Any] = {"id": run_id, "params": params,
                                 "status": "pending"}
        # atomic dedup-and-reserve: concurrent same-seed searches see each
        # other's reservation and resample instead of running the trial twice
        if not register_if_new(entry, results_path):
            continue
        trial += 1
        try:
            cfg = params_to_config(base, params)
            # per-trial sample dir: train() WIPES cfg.train.sample_dir at start
            # (the reference's rmtree, README.md:765) — a shared dir races
            # concurrent searches between their glob and archive steps
            cfg = cfg.replace(train=cfg.train.replace(
                sample_dir=f"{cfg.train.sample_dir}_{run_id}"))
            if max_steps_per_trial is not None:
                cfg = cfg.replace(train=cfg.train.replace(
                    max_steps=max_steps_per_trial
                    if cfg.train.max_steps is None
                    else min(cfg.train.max_steps, max_steps_per_trial)))
            state, logger = train(cfg)
            loader = make_loader(cfg.data, seed=cfg.train.seed)
            mse = inference.evaluate_mse(cfg, state, iter(loader))
            entry["recon_mse"] = mse
            entry["status"] = "ok"
            # archive the last sample grid under the run UUID (README.md:1196 idea)
            sample_dir = Path(cfg.train.sample_dir)
            pngs = sorted(sample_dir.glob("*.png"),
                          key=lambda p: int(p.stem)) if sample_dir.exists() else []
            if pngs:
                os.replace(pngs[-1], Path(archive_dir) / f"{run_id}.png")
            shutil.rmtree(sample_dir, ignore_errors=True)
        except Exception as e:  # OOM, XLA aborts, shape errors — record and continue
            entry["status"] = "failed"
            entry["error"] = f"{type(e).__name__}: {e}"[:500]
        update_in_json(entry, results_path)  # pending -> ok/failed
        added.append(entry)
        mse_v = entry.get("recon_mse")
        print(f"[search {trial}/{n_trials}] {entry['status']}"
              + (f" mse={mse_v:.4f}" if mse_v is not None else ""))
    return added
