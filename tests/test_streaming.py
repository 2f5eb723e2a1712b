"""Tests for the streaming (continuation-batched) runner
(inference/streaming.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _problem(num_tiles, key=11):
    """Distinguishable tiles: tile i holds i (mod 4) bright stars."""
    from smcdet_tpu.inference.kernels import SingleComponentMH
    from smcdet_tpu.inference.smc import SMCConfig
    from smcdet_tpu.models.imaging import ImageModel
    from smcdet_tpu.models.priors import (
        NormalFlux,
        PointProcessPrior,
        UniformCounts,
    )
    from smcdet_tpu.models.psf import GaussianPSF

    M = 3
    prior = PointProcessPrior(
        min_objects=0,
        max_objects=M,
        image_height=8,
        image_width=8,
        pad=1.0,
        counts=UniformCounts(0, M),
        flux=NormalFlux(mean=jnp.float32(800.0), stdev=jnp.float32(80.0)),
    )
    model = ImageModel(
        height=8,
        width=8,
        psf_radius=4,
        noise="poisson",
        background=jnp.float32(100.0),
        psf=GaussianPSF(stdev=jnp.float32(0.9)),
    )
    kernel = SingleComponentMH(
        num_iters=30,
        locs_stdev=jnp.float32(0.2),
        fluxes_stdev=jnp.float32(15.0),
        fluxes_min=jnp.float32(0.0),
        fluxes_max=jnp.float32(2000.0),
    )
    cfg = SMCConfig(
        num_catalogs=256,
        ess_threshold_prop=0.5,
        resample_method="systematic",
        max_smc_iters=60,
        flux_detection_threshold=200.0,
    )
    all_locs = jnp.asarray(
        [[2.0, 2.0], [5.5, 5.5], [2.0, 6.0]], dtype=jnp.float32
    )
    images = []
    true_counts = []
    for i in range(num_tiles):
        c = i % (M + 1)
        locs = jnp.where(
            (jnp.arange(M) < c)[:, None], all_locs, jnp.zeros((M, 2))
        )
        fluxes = jnp.where(jnp.arange(M) < c, 800.0, 0.0)
        img = model.sample(jax.random.fold_in(jax.random.key(key), i), locs, fluxes)
        images.append(img)
        true_counts.append(c)
    return jnp.stack(images), np.asarray(true_counts), prior, model, kernel, cfg


class TestFreezeInvariant:
    def test_stepping_a_done_tile_is_bitwise_identity(self):
        """Streaming's speculative steps are sound ONLY because csmc_step
        freezes tiles at temperature 1: their particles, weights, logZ,
        ESS, and acceptance diagnostics must pass through bitwise."""
        from smcdet_tpu.inference.smc import csmc_init, csmc_step

        images, truth, prior, model, kernel, cfg = _problem(3)
        key = jax.random.key(7)
        state = csmc_init(key, images, prior, model, cfg)
        # run until at least one tile is done and one is not (or all done)
        for _ in range(cfg.max_smc_iters):
            state = jax.jit(csmc_step)(images, prior, model, kernel, cfg, state)
            temps = np.asarray(state.temperature)
            if temps.max() >= 1.0:
                break
        assert temps.max() >= 1.0
        done = temps >= 1.0
        after = jax.jit(csmc_step)(images, prior, model, kernel, cfg, state)
        for field in ("locs", "fluxes", "weights", "log_z", "ess",
                      "acc_rate", "temperature", "loglik"):
            before_v = np.asarray(getattr(state, field))
            after_v = np.asarray(getattr(after, field))
            np.testing.assert_array_equal(
                before_v[done],
                after_v[done],
                err_msg=f"{field} not frozen for done tiles",
            )


class TestStreamingRunner:
    def test_pool_covering_batch_matches_run_csmc(self):
        """With pool >= T (no swaps) the streaming scheduler executes the
        same iteration sequence as run_csmc's lax.while_loop, so results
        agree to compilation-fusion tolerance."""
        from smcdet_tpu.inference.smc import run_csmc
        from smcdet_tpu.inference.streaming import run_csmc_streaming

        images, truth, prior, model, kernel, cfg = _problem(3)
        key = jax.random.key(0)
        gold = jax.jit(run_csmc)(key, images, prior, model, kernel, cfg)
        got, info = run_csmc_streaming(
            key, images, prior, model, kernel, cfg, pool=8, return_info=True
        )
        assert info["pool"] == 3
        np.testing.assert_allclose(
            np.asarray(got.temperature), np.asarray(gold.temperature)
        )
        np.testing.assert_allclose(
            np.asarray(got.log_normalizing_constant),
            np.asarray(gold.log_normalizing_constant),
            rtol=2e-5,
            atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got.weights), np.asarray(gold.weights), atol=2e-5
        )
        assert int(got.num_iters) == int(gold.num_iters)

    def test_swapping_pool_returns_each_tile_exact(self):
        """pool < T forces swaps; every returned row must be the posterior
        of ITS OWN tile (catches slot-bookkeeping/misordering bugs): the
        tiles hold 0..3 bright stars, so the posterior count mode is the
        tile identity."""
        from smcdet_tpu.inference.streaming import run_csmc_streaming

        images, truth, prior, model, kernel, cfg = _problem(6)
        result, info = run_csmc_streaming(
            jax.random.key(1),
            images,
            prior,
            model,
            kernel,
            cfg,
            pool=2,
            return_info=True,
        )
        assert info["pool"] == 2
        assert (info["per_tile_iters"] >= 1).all()
        temps = np.asarray(result.temperature)
        np.testing.assert_allclose(temps, 1.0)
        logz = np.asarray(result.log_normalizing_constant)
        assert np.isfinite(logz).all()
        pmf = jax.nn.softmax(result.log_normalizing_constant, axis=-1)
        modes = np.asarray(jnp.argmax(pmf, axis=-1))
        np.testing.assert_array_equal(modes, truth)
        # posterior weights rows are normalised
        np.testing.assert_allclose(
            np.asarray(result.weights).sum(-1), 1.0, rtol=1e-5
        )

    def test_per_tile_background_rides_the_swaps(self):
        """A [T, H, W] background map must follow its tile through slot
        swaps: tiles carry strongly different backgrounds, so a slot
        using a stale background would corrupt that tile's likelihood
        and shift its posterior count mode."""
        from smcdet_tpu.inference.streaming import run_csmc_streaming

        images, truth, prior, model, kernel, cfg = _problem(6)
        T = images.shape[0]
        levels = 100.0 + 400.0 * jnp.arange(T, dtype=jnp.float32)
        # [T, 1, 1, H, W]: broadcast-ready against the [T, C, N, HW]
        # particle batch (the run_csmc_chunked convention)
        bg_map = jnp.broadcast_to(
            levels[:, None, None, None, None], (T, 1, 1, 8, 8)
        )
        # regenerate each tile's pixels under ITS background level
        M = 3
        all_locs = jnp.asarray(
            [[2.0, 2.0], [5.5, 5.5], [2.0, 6.0]], dtype=jnp.float32
        )
        imgs = []
        for i in range(T):
            c = int(truth[i])
            locs = jnp.where(
                (jnp.arange(M) < c)[:, None], all_locs, jnp.zeros((M, 2))
            )
            fluxes = jnp.where(jnp.arange(M) < c, 800.0, 0.0)
            m_i = model.replace(background=levels[i])
            imgs.append(
                m_i.sample(jax.random.fold_in(jax.random.key(5), i), locs, fluxes)
            )
        images = jnp.stack(imgs)
        model_map = model.replace(background=bg_map)

        result = run_csmc_streaming(
            jax.random.key(2), images, prior, model_map, kernel, cfg, pool=2
        )
        np.testing.assert_allclose(np.asarray(result.temperature), 1.0)
        # compare against the single-batch sampler on the same map: a
        # slot using a stale background would shift that tile's count
        # pmf by O(1), far beyond the MC noise between the two runs
        # (measured max per-tile pmf diff ~0.07 at N=256)
        from smcdet_tpu.inference.smc import run_csmc

        gold = jax.jit(run_csmc)(
            jax.random.key(2), images, prior, model_map, kernel, cfg
        )
        pmf = np.asarray(
            jax.nn.softmax(result.log_normalizing_constant, axis=-1)
        )
        pmf_gold = np.asarray(
            jax.nn.softmax(gold.log_normalizing_constant, axis=-1)
        )
        tvd = 0.5 * np.abs(pmf - pmf_gold).sum(-1)
        assert tvd.max() < 0.2, (tvd, pmf, pmf_gold)

    def test_sharded_pool_matches_unsharded(self):
        """The pool's slot axis shards over the virtual 8-CPU tile mesh;
        the host schedule is device-layout-independent, so the sharded
        run must reproduce the unsharded streaming run."""
        from smcdet_tpu.inference.streaming import run_csmc_streaming
        from smcdet_tpu.parallel.sharding import tile_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        images, truth, prior, model, kernel, cfg = _problem(12)
        key = jax.random.key(4)
        plain, info_p = run_csmc_streaming(
            key, images, prior, model, kernel, cfg, pool=8, return_info=True
        )
        sharded, info_s = run_csmc_streaming(
            key,
            images,
            prior,
            model,
            kernel,
            cfg,
            pool=8,
            return_info=True,
            devices=tile_mesh(jax.devices()[:8]),
        )
        assert info_s["pool"] == 8
        # identical schedule => identical iteration counts and results
        np.testing.assert_array_equal(
            info_p["per_tile_iters"], info_s["per_tile_iters"]
        )
        np.testing.assert_allclose(
            np.asarray(plain.temperature), np.asarray(sharded.temperature)
        )
        np.testing.assert_allclose(
            np.asarray(plain.log_normalizing_constant),
            np.asarray(sharded.log_normalizing_constant),
            rtol=1e-4,
            atol=1e-4,
        )

    def test_mesh_multiple_pool_pads_when_tiles_run_short(self):
        """P rounds up to a mesh multiple; with T < P the extra slots are
        pad (never finalized) and every real tile still returns."""
        from smcdet_tpu.inference.streaming import run_csmc_streaming
        from smcdet_tpu.parallel.sharding import tile_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        images, truth, prior, model, kernel, cfg = _problem(5)
        result, info = run_csmc_streaming(
            jax.random.key(6),
            images,
            prior,
            model,
            kernel,
            cfg,
            pool=3,
            return_info=True,
            devices=tile_mesh(jax.devices()[:8]),
        )
        assert info["pool"] == 8  # rounded up to the mesh size
        assert result.temperature.shape == (5,)
        np.testing.assert_allclose(np.asarray(result.temperature), 1.0)
        pmf = jax.nn.softmax(result.log_normalizing_constant, axis=-1)
        modes = np.asarray(jnp.argmax(pmf, axis=-1))
        np.testing.assert_array_equal(modes, truth)

    def test_capped_tile_finalizes_at_exactly_the_cap(self):
        """A tile that exhausts max_smc_iters with temperature < 1 must be
        finalized from the state at the cap — not from later speculative
        steps its slot keeps riding — matching run_csmc's loop bound."""
        from smcdet_tpu.inference.smc import run_csmc
        from smcdet_tpu.inference.streaming import run_csmc_streaming

        images, truth, prior, model, kernel, cfg = _problem(2)
        cfg = cfg.replace(max_smc_iters=3)  # far below convergence
        key = jax.random.key(9)
        gold = jax.jit(run_csmc)(key, images, prior, model, kernel, cfg)
        got, info = run_csmc_streaming(
            key, images, prior, model, kernel, cfg, pool=2, return_info=True
        )
        assert (info["per_tile_iters"] <= 3).all()
        # identical executed sequence up to the cap
        np.testing.assert_allclose(
            np.asarray(got.temperature),
            np.asarray(gold.temperature),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(got.log_normalizing_constant),
            np.asarray(gold.log_normalizing_constant),
            rtol=2e-5,
            atol=2e-5,
        )

    def test_measured_pool_check_halves_until_fit(self, monkeypatch):
        """The AOT memory probe must shrink the pool when XLA's measured
        allocation exceeds the budget (exercised with a fake meter; the
        CPU backend reports no temp stats so the real probe is
        TPU-only)."""
        from smcdet_tpu.inference import streaming

        images, truth, prior, model, kernel, cfg = _problem(2)
        monkeypatch.setattr(
            streaming.jax, "default_backend", lambda: "fake_tpu"
        )
        # pretend each pool slot costs 1 GiB
        monkeypatch.setattr(
            streaming,
            "_step_jit",
            type(
                "J",
                (),
                {
                    "lower": staticmethod(
                        lambda *a, **k: type(
                            "L", (), {"compile": staticmethod(lambda: a[0])}
                        )
                    )
                },
            ),
        )
        monkeypatch.setattr(
            streaming,
            "compiled_live_bytes",
            lambda imgs: imgs.shape[0] * 2**30,
        )
        streaming._checked_pool_shapes.clear()
        P = streaming._measured_pool_check(
            16, images, None, False, prior, model, kernel, cfg,
            budget_bytes=3 * 2**30,
        )
        assert P == 2  # 16 -> 8 -> 4 -> 2 slots x 1 GiB <= 3 GiB
        streaming._checked_pool_shapes.clear()

    def test_rejects_global_iteration_configs(self):
        from smcdet_tpu.inference.streaming import run_csmc_streaming

        images, truth, prior, model, kernel, cfg = _problem(2)
        with pytest.raises(ValueError):
            run_csmc_streaming(
                jax.random.key(0),
                images,
                prior,
                model,
                kernel,
                cfg.replace(record_history=True),
                pool=2,
            )
