"""Tests for observability + checkpointing utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcdet_tpu.inference.smc import SMCConfig, run_csmc
from smcdet_tpu.utils.checkpoint import load_pytree, save_pytree
from smcdet_tpu.utils.diagnostics import PhaseTimer, summarize_diagnostics
from tests.test_smc import two_star_image


class TestPhaseTimer:
    def test_accumulates_and_reports(self):
        timer = PhaseTimer()
        with timer("a"):
            sum(range(1000))
        with timer("a"):
            sum(range(1000))
        with timer("b"):
            pass
        assert timer.counts["a"] == 2
        rep = timer.report()
        assert "a" in rep and "b" in rep and "share" in rep


@pytest.mark.slow
class TestHistory:
    @pytest.fixture(scope="class")
    def result(self):
        image, prior, model, kernel = two_star_image()
        cfg = SMCConfig(
            num_catalogs=64,
            resample_method="systematic",
            max_smc_iters=30,
            record_history=True,
        )
        return jax.block_until_ready(
            jax.jit(run_csmc)(
                jax.random.key(0), image[None], prior, model, kernel, cfg
            )
        )

    def test_history_recorded(self, result):
        n = int(result.num_iters)
        assert result.history is not None
        temp = np.asarray(result.history["temperature"])[:n, 0]
        # temperatures are non-decreasing and end at 1
        assert (np.diff(temp) >= -1e-6).all()
        np.testing.assert_allclose(temp[-1], 1.0)
        assert np.asarray(result.history["ess"]).shape[1:] == (1, 4)

    def test_summary_renders(self, result):
        text = summarize_diagnostics(result)
        assert "iterations" in text and "temperature" in text
        assert f"iter {int(result.num_iters):3d}" in text


class TestCheckpoint:
    @pytest.mark.slow
    def test_roundtrip_smc_result(self, tmp_path):
        image, prior, model, kernel = two_star_image()
        cfg = SMCConfig(num_catalogs=32, max_smc_iters=10)
        r = jax.jit(run_csmc)(
            jax.random.key(1), image[None], prior, model, kernel, cfg
        )
        path = save_pytree(tmp_path / "state", r)
        r2 = load_pytree(path, r)
        np.testing.assert_array_equal(np.asarray(r.counts), r2.counts)
        np.testing.assert_allclose(
            np.asarray(r.log_normalizing_constant),
            r2.log_normalizing_constant,
        )
        np.testing.assert_allclose(np.asarray(r.fluxes), r2.fluxes)
