"""Training loop (reference ``train_network_wgan``, README.md:742-857).

Event-order faithful to the reference:
- the inference-image folder is wiped at start (README.md:765-766);
- D updates every batch; G every ``n_critics``-th batch of each epoch (``i``
  resets per epoch, README.md:812);
- a 5x5 sample grid of the step's generated images is written every
  ``sample_interval`` batches (README.md:851-854) — regenerated from the
  pre-update params with the step's own rng key, so the PNG matches what that
  step's G half saw, without adding a per-step device->host transfer;
- per-batch metric lines via MetricsLogger (async; no per-step sync).

TPU-first differences: the step is jitted once per (do_g_update) variant with donated
state; batches stream through the device-prefetch pipeline; checkpoints (orbax)
every N steps — a capability the reference lacks.
"""

from __future__ import annotations

import shutil
import time
from pathlib import Path
from typing import Any, Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp

from vaegan_tpu.config import Config
from vaegan_tpu.data.pipeline import device_prefetch, make_loader
from vaegan_tpu.train.state import TrainState, build_models, create_train_state
from vaegan_tpu.train.step import make_paper_train_step, make_train_step
from vaegan_tpu.utils.metrics import MetricsLogger


class TrainingDiverged(RuntimeError):
    """Raised by the opt-in NaN guard (failure detection the reference lacks —
    its only resilience is a buggy OOM catch in the search script, README.md:1193)."""


def make_sampler(cfg: Config) -> Callable:
    """jitted fn regenerating a step's gen_imgs (same rngs as the train step).

    The split count must match the step variant exactly — threefry subkeys depend
    on the total split width, so splitting differently would sample a DIFFERENT
    forward than the one trained on."""
    from vaegan_tpu.train.step import PAPER_RNG_KEYS, TWO_OPT_RNG_KEYS

    gen, _ = build_models(cfg)
    n_keys = PAPER_RNG_KEYS if cfg.optim.scheme == "three" else TWO_OPT_RNG_KEYS
    accum = cfg.train.grad_accum > 1

    @jax.jit
    def sample(state: TrainState, batch, key):
        if accum:
            # the accumulating step derives per-microbatch keys first; regenerate
            # microbatch 0's images (grid diagnostics only)
            k = cfg.train.grad_accum
            key = jax.random.split(key, k)[0]
            batch = batch[: batch.shape[0] // k]
        k_gdrop, k_gnoise = jax.random.split(key, n_keys)[:2]
        out = gen.apply(
            {"params": state.g_params, "batch_stats": state.g_stats},
            batch, train=True, rngs={"dropout": k_gdrop, "noise": k_gnoise},
            mutable=["batch_stats"])[0]
        return out[0] if cfg.generator.is_vae else out

    return sample


def train(
    cfg: Config,
    loader: Optional[Iterable] = None,
    state: Optional[TrainState] = None,
    logger: Optional[MetricsLogger] = None,
    sharding: Optional[Any] = None,
    step_fns: Optional[Any] = None,
    resume: bool = False,
) -> Tuple[TrainState, MetricsLogger]:
    """Run ``cfg.train.n_epochs`` of training; returns (final_state, logger).

    ``sharding``: optional jax.sharding.NamedSharding for batches (data parallel);
    ``step_fns``: optional step overrides (used by the parallel module to supply
    pjit-compiled steps): either a (step_with_g, step_d_only) tuple, or — when
    ``cfg.train.gp_every > 1`` — a dict keyed by (do_g_update, do_gp);
    ``resume``: restore the latest checkpoint under ``cfg.train.checkpoint_dir``
    and continue (skips already-completed steps) — restart/recovery support the
    reference lacks entirely (SURVEY.md §5).
    """
    tcfg = cfg.train
    key = jax.random.key(tcfg.seed, impl=tcfg.rng_impl)
    if loader is None:
        dcfg = cfg.data
        if tcfg.grad_accum > 1 and not dcfg.drop_last:
            # a partial tail batch cannot be split into grad_accum microbatches
            # (the accum step requires batch % grad_accum == 0); drop it, like
            # the multi-process loader already does
            dcfg = dcfg.replace(drop_last=True)
        # sharding forwarded for the hbm_cache (DeviceDataLoader) path: the
        # on-device gather emits batches already in the step's input layout
        loader = make_loader(dcfg, seed=tcfg.seed, sharding=sharding)
    if state is None:
        state = create_train_state(cfg, key)
    if logger is None:
        logger = MetricsLogger(flush_every=tcfg.log_every)

    # lazy GP (cfg.train.gp_every > 1): the loop alternates between variants
    # with and without the penalty's grad-of-grad; both are static jit variants,
    # like do_g_update. make_step_variants applies the λ·gp_every scaling on GP
    # steps — the step builders themselves never scale λ on their own.
    from vaegan_tpu.train.step import lazy_gp_enabled, make_step_variants
    lazy_gp = lazy_gp_enabled(cfg)
    if step_fns is not None:
        if isinstance(step_fns, dict):
            steps = step_fns
        else:
            if lazy_gp:
                raise ValueError(
                    "cfg.train.gp_every > 1 requires step_fns keyed by "
                    "(do_g_update, do_gp), got a 2-tuple")
            step_g, step_d = step_fns
            steps = {(True, True): step_g, (False, True): step_d}
    elif cfg.optim.scheme == "three":
        fn = jax.jit(make_paper_train_step(cfg), donate_argnums=0)
        steps = {(True, True): fn}
    else:
        steps = make_step_variants(cfg, lambda do_g, do_gp, scale: jax.jit(
            make_train_step(cfg, do_g_update=do_g, do_gp=do_gp,
                            gp_lambda_scale=scale),
            donate_argnums=0))
    if cfg.optim.scheme != "three":
        # fail fast on a malformed override dict, not KeyError mid-epoch after
        # state has been donated (the tuple branch above already fails at entry)
        need = {(True, True), (False, True)} | (
            {(True, False), (False, False)} if lazy_gp else set())
        missing = need - set(steps)
        if missing:
            raise ValueError(
                f"step_fns is missing (do_g_update, do_gp) variants {sorted(missing)} "
                f"required by this config (gp_every={tcfg.gp_every})")

    ckpt = None
    start_step = 0
    if tcfg.checkpoint_dir:
        from vaegan_tpu.checkpoint import CheckpointManager
        ckpt = CheckpointManager(tcfg.checkpoint_dir)
        if resume and ckpt.latest_step() is not None:
            # tri-state: None = probe couldn't read the checkpoint's metadata
            # (e.g. an orbax layout change) — trust the current flags and let
            # restore() validate the structure instead of guessing "no EMA"
            saved_ema = ckpt.saved_has_g_ema()
            if saved_ema is True and state.g_ema is None:
                # resuming without the flag would silently stop EMA tracking
                # mid-run (and orbax's structure-mismatch error is cryptic)
                raise ValueError(
                    f"checkpoint at {tcfg.checkpoint_dir} carries a generator "
                    "EMA; pass the same ema_decay (--ema-decay) to resume")
            if saved_ema is False and state.g_ema is not None:
                # checkpoint predates EMA tracking: restore without the leaf,
                # then start the average from the restored params
                restored = ckpt.restore(state.replace(g_ema=None))
                state = restored.replace(
                    g_ema=jax.tree.map(jnp.copy, restored.g_params))
            else:
                state = ckpt.restore(state)
            start_step = int(jax.device_get(state.step))

    sample_dir = Path(tcfg.sample_dir)
    if start_step == 0:
        # fresh run: wipe like the reference (README.md:765). On resume, keep the
        # interrupted run's grids — the skipped steps would never regenerate them.
        shutil.rmtree(sample_dir, ignore_errors=True)
    sample_dir.mkdir(parents=True, exist_ok=True)
    sampler = make_sampler(cfg)

    n_batches = len(loader) if hasattr(loader, "__len__") else -1
    global_step = 0
    nan_checked = 0
    budget_hit = False
    t0 = time.time()
    for epoch in range(tcfg.n_epochs):
        if budget_hit:
            break
        # resume fast-forward without decoding: skip whole completed epochs by
        # replaying only the shuffle RNG, and open partial epochs at the right
        # batch offset (loaders without these hooks fall back to decode-and-skip)
        skip_in_epoch = 0
        if global_step < start_step and n_batches > 0:
            if global_step + n_batches <= start_step and hasattr(loader, "skip_epoch"):
                loader.skip_epoch()
                global_step += n_batches
                continue
            # bounded to this epoch: a loader exposing iter_batches but not
            # skip_epoch still consumes exactly one epoch per outer iteration
            skip_in_epoch = min(start_step - global_step, n_batches)
        batch_offset = 0
        if skip_in_epoch and hasattr(loader, "iter_batches"):
            source = loader.iter_batches(skip_in_epoch)
            global_step += skip_in_epoch
            batch_offset = skip_in_epoch
        else:
            source = iter(loader)
        it = device_prefetch(source, sharding, depth=cfg.data.prefetch,
                             global_batch=cfg.data.batch_size)
        for i, batch in enumerate(it, start=batch_offset):
            if global_step < start_step:  # fallback decode-and-skip
                global_step += 1
                continue
            if tcfg.max_steps is not None and global_step >= tcfg.max_steps:
                # check BEFORE executing: a resumed run whose checkpoint already
                # sits at the budget must not run (and re-checkpoint) extra steps
                budget_hit = True
                break
            step_key = jax.random.fold_in(key, global_step)
            do_g = (i % tcfg.n_critics) == 0  # README.md:812
            batches_done = epoch * n_batches + i if n_batches > 0 else global_step
            # regenerate this step's gen_imgs BEFORE the step (the step donates
            # its input state buffers)
            sample_imgs = (sampler(state, batch, step_key)
                           if tcfg.sample_interval > 0
                           and batches_done % tcfg.sample_interval == 0 else None)
            do_gp = (not lazy_gp) or (global_step % tcfg.gp_every == 0)
            step = steps[(do_g, do_gp)] if cfg.optim.scheme != "three" \
                else steps[(True, True)]
            state, metrics = step(state, batch, step_key)
            logger.log(epoch, tcfg.n_epochs, i, n_batches, metrics)
            if tcfg.nan_check and (global_step + 1) % logger.flush_every == 0:
                logger.flush()
                window = logger.history[nan_checked:]
                nan_checked = len(logger.history)
                bad = sorted({k for m in window for k, v in m.items()
                              if v != v or abs(v) == float("inf")})
                if bad:
                    raise TrainingDiverged(
                        f"non-finite metrics {bad} within the last flush window "
                        f"(ending epoch {epoch} batch {i}, step {global_step}); "
                        f"last checkpoint: {ckpt.latest_step() if ckpt else None}")

            if sample_imgs is not None:
                from vaegan_tpu.utils.imaging import save_image_grid
                save_image_grid(jax.device_get(sample_imgs[:25]),
                                str(sample_dir / f"{batches_done}.png"), nrow=5)
            if (ckpt is not None and tcfg.checkpoint_every > 0
                    and (global_step + 1) % tcfg.checkpoint_every == 0):
                ckpt.save(state)
            global_step += 1
            if tcfg.max_steps is not None and global_step >= tcfg.max_steps:
                budget_hit = True
                break

    logger.flush()
    if ckpt is not None:
        # no force: if the periodic save already persisted this step, keep it
        # (force now means OVERWRITE, for re-imports — checkpoint.py)
        ckpt.save(state)
        ckpt.wait()
    elapsed = time.time() - t0
    executed = global_step - start_step
    logger.history.append({
        "_wall_s": elapsed,
        "_steps": executed,
        "_steps_per_sec": executed / max(elapsed, 1e-9),
        "_images_per_sec": executed * cfg.data.batch_size / max(elapsed, 1e-9),
    })
    return state, logger
