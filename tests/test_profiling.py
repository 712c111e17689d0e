"""Tests for the tracing/profiling subsystem (SURVEY.md §5 — absent in the
reference; first-class here)."""

import os
import time

import jax
import jax.numpy as jnp

from vaegan_tpu.utils.profiling import StepTimer, annotate, trace


class TestTrace:
    def test_trace_produces_dump(self, tmp_path):
        d = str(tmp_path / "trace")
        with trace(d):
            with annotate("compute"):
                x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((64, 64)))
                jax.block_until_ready(x)
        dumped = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
        assert dumped, "profiler trace produced no files"

    def test_annotate_is_reentrant(self):
        with annotate("outer"):
            with annotate("inner"):
                pass


class TestStepTimer:
    def test_warmup_excluded_and_rate_positive(self):
        t = StepTimer(warmup=2)
        for _ in range(2):
            t.tick()
        time.sleep(0.05)
        for _ in range(5):
            t.tick()
            time.sleep(0.01)
        r = t.result(images_per_step=8)
        assert r["steps_per_sec"] > 0
        assert abs(r["images_per_sec"] - 8 * r["steps_per_sec"]) < 1e-6

    def test_no_steps_after_warmup(self):
        t = StepTimer(warmup=2)
        t.tick()
        r = t.result(images_per_step=4)
        assert r == {"steps_per_sec": 0.0, "images_per_sec": 0.0,
                     "seconds_per_step": 0.0}

    def test_zero_warmup_times_from_construction(self):
        """warmup=0 (pre-warmed caller) must actually measure: tick() only
        fires after each step, so the clock starts at construction."""
        t = StepTimer(warmup=0)
        t.tick()
        r = t.result(images_per_step=4)
        assert r["steps_per_sec"] > 0.0
        assert r["images_per_sec"] > 0.0
        assert r["seconds_per_step"] > 0.0

    def test_sync_value_path(self):
        t = StepTimer(warmup=1)
        v = jnp.asarray(1.0)
        t.tick(sync_value=v)
        t.tick(sync_value=v)
        r = t.result(images_per_step=2, sync_value=v)
        assert r["steps_per_sec"] >= 0
