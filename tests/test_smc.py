"""End-to-end tests of the CS-SMC driver (inference/smc.py).

The reference has no automated tests; its correctness evidence is
statistical (SURVEY.md §4). These tests cover the deterministic contract
(termination, weight/logZ bookkeeping, shapes) plus a small posterior
sanity check on an unambiguous synthetic image, and sharded-vs-unsharded
agreement on a virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcdet_tpu.inference.kernels import SingleComponentMH
from smcdet_tpu.inference.smc import SMCConfig, SMCSampler, run_csmc, tile_image
from smcdet_tpu.models.imaging import ImageModel
from smcdet_tpu.models.priors import (
    NormalFlux,
    PointProcessPrior,
    UniformCounts,
)
from smcdet_tpu.models.psf import GaussianPSF


def make_setup(max_objects=3, tile=8):
    prior = PointProcessPrior(
        min_objects=0,
        max_objects=max_objects,
        image_height=tile,
        image_width=tile,
        pad=1.0,
        counts=UniformCounts(low=0, high=max_objects),
        flux=NormalFlux(mean=jnp.float32(2000.0), stdev=jnp.float32(200.0)),
    )
    model = ImageModel(
        height=tile,
        width=tile,
        psf_radius=4,
        noise="poisson",
        background=jnp.float32(100.0),
        psf=GaussianPSF(stdev=jnp.float32(1.0)),
    )
    kernel = SingleComponentMH(
        num_iters=20,
        locs_stdev=jnp.float32(0.25),
        fluxes_stdev=jnp.float32(50.0),
        fluxes_min=jnp.float32(100.0),
        fluxes_max=jnp.float32(5000.0),
    )
    return prior, model, kernel


def two_star_image():
    """Unambiguous tile: two bright well-separated stars."""
    prior, model, kernel = make_setup()
    locs = jnp.asarray([[2.0, 2.5], [5.5, 5.0], [0.0, 0.0]])
    fluxes = jnp.asarray([2000.0, 2100.0, 0.0])
    image = model.sample(jax.random.key(42), locs, fluxes)
    return image, prior, model, kernel


class TestRunCSMC:
    @pytest.fixture(scope="class")
    def result(self):
        image, prior, model, kernel = two_star_image()
        cfg = SMCConfig(
            num_catalogs=256,
            ess_threshold_prop=0.5,
            resample_method="systematic",
            max_smc_iters=50,
            flux_detection_threshold=200.0,
        )
        res = jax.jit(run_csmc)(
            jax.random.key(0), image[None], prior, model, kernel, cfg
        )
        return jax.block_until_ready(res)

    def test_terminates_at_temperature_one(self, result):
        np.testing.assert_allclose(np.asarray(result.temperature), 1.0)
        assert int(result.num_iters) < 50

    def test_shapes_and_weights(self, result):
        T, CN = result.counts.shape
        assert T == 1 and CN == 4 * 256
        w = np.asarray(result.weights)
        np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
        assert np.isfinite(np.asarray(result.log_normalizing_constant)).all()

    def test_posterior_count_is_two(self, result):
        # Posterior count pmf = softmax over per-stratum logZ; stratum 2
        # (index 2) should dominate for two bright separated stars.
        lz = np.asarray(result.log_normalizing_constant[0])
        pmf = np.exp(lz - lz.max())
        pmf = pmf / pmf.sum()
        assert pmf.argmax() == 2, pmf
        assert pmf[2] > 0.5, pmf

    def test_pruned_counts_match_posterior(self, result):
        # Weighted pruned-count posterior mean should be near 2.
        mean = float(
            (np.asarray(result.weights) * np.asarray(result.pruned_counts)).sum()
        )
        assert 1.5 < mean < 2.5, mean

    def test_acceptance_rate_reasonable(self, result):
        # applied-move rate: ~half the slots are inactive and the chain is
        # near equilibrium, so small-but-nonzero is the healthy regime
        acc = float(result.acc_rate[0])
        assert 0.003 < acc <= 1.0

    def test_pair_sweeps_wiring(self, result):
        # Driver-level wiring of the coordinated two-star move
        # (SMCConfig.pair_sweeps -> kernels.pair_redistribute_sweeps; the
        # move's own exactness is tested in test_pair_moves.py): the run
        # must still converge, and the posterior must agree with the
        # pair-free run on the unambiguous two-star image.
        image, prior, model, kernel = two_star_image()
        cfg = SMCConfig(
            num_catalogs=256,
            ess_threshold_prop=0.5,
            resample_method="systematic",
            max_smc_iters=50,
            flux_detection_threshold=200.0,
            pair_sweeps=2,
        )
        res = jax.block_until_ready(
            jax.jit(run_csmc)(
                jax.random.key(0), image[None], prior, model, kernel, cfg
            )
        )
        np.testing.assert_allclose(np.asarray(res.temperature), 1.0)
        lz = np.asarray(res.log_normalizing_constant[0])
        pmf = np.exp(lz - lz.max())
        pmf = pmf / pmf.sum()
        assert pmf.argmax() == 2, pmf
        lz0 = np.asarray(result.log_normalizing_constant[0])
        pmf0 = np.exp(lz0 - lz0.max())
        pmf0 = pmf0 / pmf0.sum()
        assert 0.5 * np.abs(pmf - pmf0).sum() < 0.2, (pmf, pmf0)


@pytest.mark.slow
class TestSharding:
    def test_sharded_matches_single_device(self):
        from smcdet_tpu.parallel.sharding import shard_tiles_jit, tile_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        image, prior, model, kernel = two_star_image()
        images = jnp.tile(image[None], (8, 1, 1))
        cfg = SMCConfig(
            num_catalogs=64,
            max_smc_iters=20,
            resample_method="systematic",
        )
        key = jax.random.key(3)
        single = jax.jit(run_csmc)(key, images, prior, model, kernel, cfg)
        mesh = tile_mesh(jax.devices()[:8])
        sharded = shard_tiles_jit(run_csmc, mesh)(
            key, images, prior, model, kernel, cfg
        )
        np.testing.assert_allclose(
            np.asarray(single.log_normalizing_constant),
            np.asarray(sharded.log_normalizing_constant),
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(single.temperature), np.asarray(sharded.temperature),
            rtol=1e-5,
        )


class TestTileImage:
    def test_tiling_layout(self):
        img = jnp.arange(16.0).reshape(4, 4)
        tiles = tile_image(img, 2, 2, 2)
        assert tiles.shape == (4, 2, 2)
        np.testing.assert_allclose(
            np.asarray(tiles[0]), [[0.0, 1.0], [4.0, 5.0]]
        )
        np.testing.assert_allclose(
            np.asarray(tiles[3]), [[10.0, 11.0], [14.0, 15.0]]
        )


class TestSamplerWrapper:
    def test_wrapper_runs_and_summarizes(self, capsys):
        image, prior, model, kernel = two_star_image()
        sampler = SMCSampler(
            image=image,
            tile_dim=8,
            Prior=prior,
            ImageModel=model,
            MutationKernel=kernel,
            num_catalogs=64,
            max_smc_iters=20,
            flux_detection_threshold=200.0,
        )
        res = sampler.run(jax.random.key(1))
        assert res.counts.shape == (1, 4 * 64)
        sampler.summarize()
        out = capsys.readouterr().out
        assert "posterior" in out


class TestMALA:
    def test_mala_kernel_end_to_end(self):
        from smcdet_tpu.inference.kernels import SingleComponentMALA

        image, prior, model, _ = two_star_image()
        kernel = SingleComponentMALA(
            num_iters=15,
            locs_step=jnp.float32(0.15),
            fluxes_step=jnp.float32(30.0),
            fluxes_min=jnp.float32(100.0),
            fluxes_max=jnp.float32(5000.0),
        )
        cfg = SMCConfig(
            num_catalogs=96,
            resample_method="systematic",
            max_smc_iters=40,
            flux_detection_threshold=200.0,
        )
        r = jax.jit(run_csmc)(
            jax.random.key(2), image[None], prior, model, kernel, cfg
        )
        np.testing.assert_allclose(np.asarray(r.temperature), 1.0)
        lz = np.asarray(r.log_normalizing_constant[0])
        pmf = np.exp(lz - lz.max())
        pmf = pmf / pmf.sum()
        assert pmf.argmax() == 2, pmf
        assert 0.01 < float(r.acc_rate[0]) <= 1.0


class TestFixedSchedule:
    def test_ladder_followed_exactly(self):
        image, prior, model, kernel = two_star_image()
        ladder = (0.1, 0.3, 0.6, 1.0)
        cfg = SMCConfig(
            num_catalogs=64,
            max_smc_iters=20,
            record_history=True,
            fixed_schedule=ladder,
        )
        r = jax.jit(run_csmc)(
            jax.random.key(3), image[None], prior, model, kernel, cfg
        )
        assert int(r.num_iters) == 3  # iterations after the init temper
        temps = np.asarray(r.history["temperature"])[:3, 0]
        np.testing.assert_allclose(temps, [0.3, 0.6, 1.0], atol=1e-6)
        np.testing.assert_allclose(float(r.temperature[0]), 1.0)


class TestChunkedTiles:
    def test_chunked_matches_unchunked(self):
        """Forcing the memory-budget chunking must reproduce the
        unchunked pipeline: same shapes, every tile tempered to 1, and
        per-tile posterior summaries within MC tolerance (the chunks use
        independent fold_in keys, so bit-identity is not expected)."""
        prior, model, kernel = make_setup()
        key = jax.random.key(3)
        # 4 tiles as one 16x16 image
        locs = jnp.asarray([[2.0, 2.5], [5.5, 5.0], [0.0, 0.0]])
        fluxes = jnp.asarray([2000.0, 2100.0, 0.0])
        tile = model.sample(key, locs, fluxes)
        image = jnp.concatenate(
            [jnp.concatenate([tile, tile], 1)] * 2, 0
        )  # [16, 16]

        def build():
            return SMCSampler(
                image=image,
                tile_dim=8,
                Prior=prior,
                ImageModel=model,
                MutationKernel=kernel,
                num_catalogs=512,
                max_smc_iters=50,
                flux_detection_threshold=200.0,
            )

        whole = build()
        res_whole = whole.run(jax.random.key(7))

        chunked = build()
        chunked.memory_budget_bytes = 1  # force chunk size 1
        assert chunked._max_tiles_per_chunk() == 1
        res_chunk = chunked.run(jax.random.key(7))

        assert res_chunk.counts.shape == res_whole.counts.shape
        assert res_chunk.pruned_locs.shape == res_whole.pruned_locs.shape
        np.testing.assert_allclose(np.asarray(res_chunk.temperature), 1.0)
        mean_whole = np.asarray(whole.posterior_mean_count())
        mean_chunk = np.asarray(chunked.posterior_mean_count())
        # all four tiles are copies of a clear 2-star scene
        np.testing.assert_allclose(mean_chunk, mean_whole, atol=0.25)
        lz_whole = np.asarray(res_whole.log_normalizing_constant)
        lz_chunk = np.asarray(res_chunk.log_normalizing_constant)
        pmf_whole = np.exp(lz_whole - lz_whole.max(-1, keepdims=True))
        pmf_whole /= pmf_whole.sum(-1, keepdims=True)
        pmf_chunk = np.exp(lz_chunk - lz_chunk.max(-1, keepdims=True))
        pmf_chunk /= pmf_chunk.sum(-1, keepdims=True)
        np.testing.assert_allclose(pmf_chunk, pmf_whole, atol=0.15)


class TestMeasuredMemoryModel:
    """The chunked runner's measured-memory feedback (inference/smc.py
    ``compiled_live_bytes``): XLA's compiled memory stats replace the
    hand-tuned 5-copy constant wherever the backend reports them."""

    def test_compiled_live_bytes_measures_the_smc_program(self):
        # The compiled SMC program reports real temp allocations; the
        # measured live bytes must cover at least the argument + output
        # footprint. A trivial temp-free program reports None ("not
        # measured" — the analytic estimate then stands).
        from smcdet_tpu.inference.smc import compiled_live_bytes

        prior, model, kernel = make_setup()
        image, *_ = (two_star_image()[0][None],)
        cfg = SMCConfig(num_catalogs=32, max_smc_iters=3)
        compiled = (
            jax.jit(run_csmc)
            .lower(jax.random.key(0), image, prior, model, kernel, cfg)
            .compile()
        )
        live = compiled_live_bytes(compiled)
        ma = compiled.memory_analysis()
        assert live is not None
        assert live >= int(ma.argument_size_in_bytes) + int(
            ma.output_size_in_bytes
        )

        trivial = (
            jax.jit(lambda x: x + 1.0).lower(jnp.ones(8)).compile()
        )
        assert compiled_live_bytes(trivial) is None

    def test_analytic_estimate_bounds_measured_live_bytes(self):
        # On a backend with real temp stats (TPU), the analytic per-tile
        # model must be conservative: measured live bytes of a compiled
        # chunk <= the analytic budget that sized it.
        from smcdet_tpu.inference.smc import (
            compiled_live_bytes,
            max_tiles_per_chunk,
        )

        if jax.devices()[0].platform != "tpu":
            pytest.skip("needs a backend with temp memory stats")
        prior, model, kernel = make_setup()
        image = two_star_image()[0]
        images = jnp.broadcast_to(image, (4,) + image.shape)
        cfg = SMCConfig(num_catalogs=256, max_smc_iters=3)
        compiled = (
            jax.jit(run_csmc)
            .lower(jax.random.key(0), images, prior, model, kernel, cfg)
            .compile()
        )
        live = compiled_live_bytes(compiled)
        assert live is not None
        per_tile_analytic = None
        budget = 12 * 2**30
        chunk = max_tiles_per_chunk(prior, 256, 64, budget)
        per_tile_analytic = budget / chunk
        assert live / 4 <= per_tile_analytic


@pytest.mark.slow
def test_saturated_single_stratum_mode():
    """The reference's *current* drivers run a single saturated stratum
    (min_objects == max_objects == 10, num_counts == 1; e.g.
    /root/reference/experiments/m71synthetic/run_smc.py:50-51 and
    notebooks/smc.ipynb) with the detectable count emerging entirely from
    pruning. The general count stratification must subsume this mode."""
    from smcdet_tpu.models.imaging import M71ImageModel
    from smcdet_tpu.models.priors import M71Prior

    prior = M71Prior(
        min_objects=10, max_objects=10, counts_rate=0.03,
        image_height=8, image_width=8, flux_alpha=0.214,
        flux_lower=0.252, flux_upper=1804.679, pad=4.0,
    )
    assert prior.num_counts == 1
    model = M71ImageModel(
        image_height=8, image_width=8, background=865.0,
        adu_per_nmgy=856.0, psf_radius=8,
        psf_params=(1.51, 4.85, 1.32, 3.0, 0.09, 0.002),
        noise_multiplicative=1.94,
    )
    kernel = SingleComponentMH(
        num_iters=100, locs_stdev=jnp.float32(0.25),
        fluxes_stdev=jnp.float32(5.0),
        fluxes_min=jnp.float32(0.252), fluxes_max=jnp.float32(1804.679),
    )
    key = jax.random.key(0)
    img = model.sample(
        key,
        jnp.asarray([[3.0, 3.0], [5.0, 6.0]] + [[0.0, 0.0]] * 8),
        jnp.asarray([800.0, 600.0] + [0.0] * 8),
    )
    cfg = SMCConfig(
        num_catalogs=1024, ess_threshold_prop=0.5,
        resample_method="systematic", max_smc_iters=100,
        flux_detection_threshold=0.7,
    )
    res = jax.jit(run_csmc)(key, img[None], prior, model, kernel, cfg)
    assert res.log_normalizing_constant.shape == (1, 1)
    np.testing.assert_allclose(float(res.temperature[0]), 1.0)
    pc = np.asarray(res.pruned_counts[0])
    w = np.asarray(res.weights[0])
    pmf = np.bincount(pc, weights=w, minlength=11)
    # two bright true stars: posterior mass concentrates on 2-3
    # detectable sources (3 = an occasional padding star), none at 10
    assert pmf[2] + pmf[3] > 0.8
    assert pmf[0] + pmf[1] < 0.05
    assert pmf[8:].sum() < 0.01


class TestRunCSMCChunked:
    def test_concat_is_bitwise_per_chunk(self):
        # run_csmc_chunked with a tiny budget must equal manual per-chunk
        # calls with the same fold_in keys, concatenated on the tile axis.
        from smcdet_tpu.inference.smc import run_csmc_chunked

        prior, model, kernel = make_setup()
        image, *_ = two_star_image()
        images = jnp.stack([image, image * 0.0 + image.mean(), image, image])
        cfg = SMCConfig(
            num_catalogs=128,
            ess_threshold_prop=0.5,
            resample_method="systematic",
            max_smc_iters=30,
            flux_detection_threshold=200.0,
        )
        key = jax.random.key(9)
        res = run_csmc_chunked(
            key, images, prior, model, kernel, cfg, budget_bytes=1
        )
        assert res.counts.shape[0] == 4
        for i in range(4):
            part = jax.jit(run_csmc)(
                jax.random.fold_in(key, i),
                images[i : i + 1],
                prior,
                model,
                kernel,
                cfg,
            )
            np.testing.assert_array_equal(
                np.asarray(res.pruned_counts[i]),
                np.asarray(part.pruned_counts[0]),
            )
            np.testing.assert_array_equal(
                np.asarray(res.weights[i]), np.asarray(part.weights[0])
            )
        np.testing.assert_allclose(np.asarray(res.temperature), 1.0)

    def test_sort_tiles_restores_caller_order(self):
        # sort_tiles=True must equal manually pre-sorting the tiles by
        # total flux, running with sort_tiles=False, and scattering the
        # results back to the caller's order — i.e. the permutation is
        # invisible except through the key->tile assignment.
        from smcdet_tpu.inference.smc import run_csmc_chunked

        prior, model, kernel = make_setup()
        image, *_ = two_star_image()
        # strictly distinct total fluxes, deliberately unsorted order
        images = jnp.stack(
            [image + 30.0, image, image + 90.0, image + 60.0]
        )
        cfg = SMCConfig(
            num_catalogs=64,
            ess_threshold_prop=0.5,
            resample_method="systematic",
            max_smc_iters=20,
            flux_detection_threshold=200.0,
            record_history=True,
        )
        key = jax.random.key(11)
        res = run_csmc_chunked(
            key, images, prior, model, kernel, cfg,
            budget_bytes=1, sort_tiles=True,
        )
        order = np.argsort(np.asarray(jnp.sum(images, axis=(1, 2))))
        manual = run_csmc_chunked(
            key, images[order], prior, model, kernel, cfg, budget_bytes=1
        )
        for j in range(4):
            np.testing.assert_array_equal(
                np.asarray(res.pruned_counts[order[j]]),
                np.asarray(manual.pruned_counts[j]),
            )
            np.testing.assert_array_equal(
                np.asarray(res.weights[order[j]]),
                np.asarray(manual.weights[j]),
            )
            np.testing.assert_array_equal(
                np.asarray(res.history["ess"][:, order[j]]),
                np.asarray(manual.history["ess"][:, j]),
            )

    def test_sort_tiles_permutes_background_map_in_lockstep(self):
        # a per-tile background map must follow the sorted tile order:
        # each tile keeps ITS background regardless of the permutation
        from smcdet_tpu.inference.smc import run_csmc_chunked

        prior, model, kernel = make_setup()
        image, *_ = two_star_image()
        images = jnp.stack([image + 80.0, image, image + 40.0])
        levels = jnp.asarray([180.0, 100.0, 140.0])
        h, w = image.shape
        bg = jnp.broadcast_to(
            levels[:, None, None, None, None], (3, 1, 1, h, w)
        )
        cfg = SMCConfig(
            num_catalogs=64,
            ess_threshold_prop=0.5,
            resample_method="systematic",
            max_smc_iters=20,
            flux_detection_threshold=200.0,
        )
        key = jax.random.key(12)
        res = run_csmc_chunked(
            key, images, prior, model.replace(background=bg), kernel,
            cfg, budget_bytes=1, sort_tiles=True,
        )
        order = np.argsort(np.asarray(jnp.sum(images, axis=(1, 2))))
        for j in range(3):
            i = int(order[j])
            part = jax.jit(run_csmc)(
                jax.random.fold_in(key, j),
                images[i : i + 1],
                prior,
                model.replace(background=float(levels[i])),
                kernel,
                cfg,
            )
            np.testing.assert_array_equal(
                np.asarray(res.pruned_counts[i]),
                np.asarray(part.pruned_counts[0]),
            )

    def test_padding_and_history_survive_chunking(self):
        # odd tile count pads the last chunk to the common shape (one XLA
        # compile) and slices back; recorded history concatenates across
        # chunks instead of being dropped
        from smcdet_tpu.inference.smc import run_csmc_chunked

        prior, model, kernel = make_setup()
        image, *_ = two_star_image()
        images = jnp.stack([image, image, image])
        cfg = SMCConfig(
            num_catalogs=64,
            ess_threshold_prop=0.5,
            resample_method="systematic",
            max_smc_iters=20,
            flux_detection_threshold=200.0,
            record_history=True,
        )
        res = run_csmc_chunked(
            jax.random.key(2), images, prior, model, kernel, cfg,
            budget_bytes=1,
        )
        assert res.counts.shape[0] == 3
        assert res.history is not None
        assert res.history["temperature"].shape[1] == 3
        assert res.history["ess"].shape[1] == 3


class TestChunkedLoweringShapes:
    def test_lowerable_run_with_ragged_multiple(self):
        # T=3 tiles, multiple=2, whole batch within one chunk: size
        # rounds up to 4 > T, so the AOT probe must be padded to the
        # chunk shape BEFORE lowering (lowering at images[:4] == shape 3
        # used to compile an executable the padded chunks couldn't call).
        from smcdet_tpu.inference.smc import run_csmc_chunked

        prior, model, kernel = make_setup()
        image, *_ = two_star_image()
        images = jnp.stack([image, image, image])
        cfg = SMCConfig(
            num_catalogs=64,
            ess_threshold_prop=0.5,
            resample_method="systematic",
            max_smc_iters=20,
            flux_detection_threshold=200.0,
        )
        res = run_csmc_chunked(
            jax.random.key(3), images, prior, model, kernel, cfg,
            run=jax.jit(run_csmc), multiple=2,
        )
        assert res.counts.shape[0] == 3
        np.testing.assert_allclose(np.asarray(res.temperature), 1.0)


class TestPerTileBackgrounds:
    def test_per_tile_map_matches_per_tile_scalars(self):
        # a [T, 1, 1, h, w] background map must reproduce T independent
        # runs each with its own scalar background (and must be chunked
        # in lockstep with the tile axis)
        from smcdet_tpu.inference.smc import run_csmc_chunked

        prior, model, kernel = make_setup()
        image, *_ = two_star_image()
        images = jnp.stack([image, image + 50.0, image])
        levels = jnp.asarray([100.0, 150.0, 125.0])
        h, w = image.shape
        bg = jnp.broadcast_to(
            levels[:, None, None, None, None], (3, 1, 1, h, w)
        )
        cfg = SMCConfig(
            num_catalogs=64,
            ess_threshold_prop=0.5,
            resample_method="systematic",
            max_smc_iters=20,
            flux_detection_threshold=200.0,
        )
        key = jax.random.key(4)
        res = run_csmc_chunked(
            key, images, prior, model.replace(background=bg),
            kernel, cfg, budget_bytes=1,
        )
        for i in range(3):
            part = jax.jit(run_csmc)(
                jax.random.fold_in(key, i),
                images[i : i + 1],
                prior,
                model.replace(background=float(levels[i])),
                kernel,
                cfg,
            )
            np.testing.assert_array_equal(
                np.asarray(res.pruned_counts[i]),
                np.asarray(part.pruned_counts[0]),
            )


class TestShardedRaggedTiles:
    def test_tile_count_not_divisible_by_mesh(self):
        # 6 tiles on an 8-device mesh: the chunked runner pads the tile
        # axis to the mesh multiple and slices back (previously
        # shard_tiles_jit raised on the indivisible count).
        if len(jax.devices()) < 2:
            import pytest

            pytest.skip("needs a multi-device mesh")
        prior, model, kernel = make_setup()
        image, *_ = two_star_image()
        big = jnp.tile(image, (3, 2))  # 3x2 grid -> 6 tiles
        s = SMCSampler(
            image=big, tile_dim=8, Prior=prior, ImageModel=model,
            MutationKernel=kernel, num_catalogs=64,
            flux_detection_threshold=200.0, max_smc_iters=20,
            resample_method="systematic",
        )
        res = s.run(jax.random.key(0), devices=jax.devices())
        assert res.counts.shape[0] == 6
        np.testing.assert_allclose(np.asarray(res.temperature), 1.0)


class TestSegmentedDispatch:
    """Bounded-dispatch mode (SMCConfig.dispatch_iters): this environment
    kills any single device program at ~200 s (UNAVAILABLE "TPU device
    error", measured by experiments/probe_long_dispatch.py — the
    cells_pair batch-7 "kernel fault" of round 4), so heavy configs chain
    host-dispatched segments. Segments must be BIT-identical to the
    monolithic while_loop: same csmc_step sequence, state round-trips
    losslessly."""

    def test_segmented_matches_monolithic_bitwise(self):
        from smcdet_tpu.inference.smc import run_csmc_segmented

        image, prior, model, kernel = two_star_image()
        base = dict(
            num_catalogs=128,
            ess_threshold_prop=0.5,
            resample_method="systematic",
            max_smc_iters=50,
            flux_detection_threshold=200.0,
        )
        mono = jax.block_until_ready(
            jax.jit(run_csmc)(
                jax.random.key(0), image[None], prior, model, kernel,
                SMCConfig(**base),
            )
        )
        seg = jax.block_until_ready(
            run_csmc_segmented(
                jax.random.key(0), image[None], prior, model, kernel,
                SMCConfig(**base, dispatch_iters=3),
            )
        )
        assert int(seg.num_iters) == int(mono.num_iters)
        for f in ("pruned_counts", "pruned_locs", "pruned_fluxes",
                  "log_normalizing_constant", "temperature", "ess",
                  "weights"):
            np.testing.assert_array_equal(
                np.asarray(getattr(seg, f)),
                np.asarray(getattr(mono, f)),
                err_msg=f,
            )

    def test_chunked_picks_segmented_runner(self):
        """run_csmc_chunked must honor cfg.dispatch_iters: results equal
        the monolithic single-chunk run bitwise (same key path)."""
        from smcdet_tpu.inference.smc import run_csmc_chunked

        image, prior, model, kernel = two_star_image()
        base = dict(
            num_catalogs=128,
            ess_threshold_prop=0.5,
            resample_method="systematic",
            max_smc_iters=50,
            flux_detection_threshold=200.0,
        )
        key = jax.random.key(5)
        mono = jax.block_until_ready(
            run_csmc_chunked(
                key, image[None], prior, model, kernel, SMCConfig(**base)
            )
        )
        seg = jax.block_until_ready(
            run_csmc_chunked(
                key, image[None], prior, model, kernel,
                SMCConfig(**base, dispatch_iters=5),
            )
        )
        np.testing.assert_array_equal(
            np.asarray(seg.pruned_counts), np.asarray(mono.pruned_counts)
        )
        np.testing.assert_array_equal(
            np.asarray(seg.log_normalizing_constant),
            np.asarray(mono.log_normalizing_constant),
        )

    def test_sampler_forwards_dispatch_iters(self):
        """SMCSampler (the per-image/aggregation pipeline's entry) must
        forward dispatch_iters into its SMCConfig — a heavy aggregation
        config that sets the knob and silently runs monolithic dispatches
        would die at the ~200 s kill limit anyway."""
        image, prior, model, kernel = two_star_image()
        s = SMCSampler(
            image=image,
            tile_dim=image.shape[0],
            Prior=prior,
            ImageModel=model,
            MutationKernel=kernel,
            num_catalogs=64,
            dispatch_iters=7,
        )
        assert s.config.dispatch_iters == 7

    def test_mesh_runner_warns_dispatch_iters_ignored(self):
        """dispatch_iters + a mesh runner (multiple > 1) is unsupported:
        the combination must warn loudly, not silently drop the knob."""
        import warnings as _w

        from smcdet_tpu.inference.smc import run_csmc_chunked

        image, prior, model, kernel = two_star_image()
        cfg = SMCConfig(
            num_catalogs=64,
            max_smc_iters=10,
            flux_detection_threshold=200.0,
            dispatch_iters=3,
        )
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            run_csmc_chunked(
                jax.random.key(0),
                jnp.stack([image, image]),
                prior, model, kernel, cfg,
                run=jax.jit(run_csmc),
                multiple=2,
            )
        assert any("dispatch_iters" in str(w.message) for w in caught)
