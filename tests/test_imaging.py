import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcdet_tpu.models.imaging import ImageModel, M71ImageModel
from smcdet_tpu.models.priors import M71Prior, ParetoStarPrior
from smcdet_tpu.models.psf import GaussianPSF, SDSSPSF
from smcdet_tpu.models.simulate import generate_images

M71_PSF_PARAMS = (1.51, 4.85, 1.32, 3.0, 0.09, 0.002)
M71_PARAMS = dict(
    background=865.0,
    adu_per_nmgy=856.0,
    psf_params=M71_PSF_PARAMS,
    psf_radius=8,
    noise_additive=0.0,
    noise_multiplicative=1.94,
)


def make_gaussian_model(dim=8):
    return ImageModel(
        height=dim,
        width=dim,
        psf_radius=8,
        noise="poisson",
        background=jnp.float32(200.0),
        psf=GaussianPSF(stdev=jnp.float32(0.93)),
    )


def naive_render(model, locs, fluxes):
    """Independent numpy implementation of the patch-truncated dense render."""
    locs = np.asarray(locs)
    fluxes = np.asarray(fluxes)
    H, W, r = model.height, model.width, model.psf_radius
    rate = np.zeros((H, W), dtype=np.float64)
    for m in range(fluxes.shape[0]):
        ly, lx = locs[m]
        for h in range(H):
            for w in range(W):
                if abs(h - np.floor(ly)) > r or abs(w - np.floor(lx)) > r:
                    continue
                r2 = (h + 0.5 - ly) ** 2 + (w + 0.5 - lx) ** 2
                rate[h, w] += fluxes[m] * float(
                    model.psf.normalized(jnp.float32(r2))
                )
    return rate * float(np.asarray(model.adu_per_nmgy)) + float(
        np.asarray(model.background)
    )


class TestRender:
    def test_matches_naive_dense(self):
        model = make_gaussian_model()
        rng = np.random.default_rng(0)
        locs = rng.uniform(-2, 10, size=(3, 2)).astype(np.float32)
        fluxes = rng.uniform(100, 2000, size=(3,)).astype(np.float32)
        rate = model.render(jnp.asarray(locs), jnp.asarray(fluxes))
        np.testing.assert_allclose(
            np.asarray(rate), naive_render(model, locs, fluxes), rtol=1e-4
        )

    def test_zero_flux_slots_are_inert(self):
        model = make_gaussian_model()
        locs = jnp.asarray([[4.0, 4.0], [2.0, 7.0]])
        fluxes = jnp.asarray([500.0, 0.0])
        r2 = model.render(locs, fluxes)
        r1 = model.render(locs[:1], fluxes[:1])
        np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), rtol=1e-6)

    def test_batched_shapes(self):
        model = make_gaussian_model()
        locs = jnp.zeros((5, 7, 3, 2)) + 4.0
        fluxes = jnp.ones((5, 7, 3)) * 100.0
        rate = model.render(locs, fluxes)
        assert rate.shape == (5, 7, 8, 8)
        ll = model.loglikelihood(jnp.ones((8, 8)) * 200.0, locs, fluxes)
        assert ll.shape == (5, 7)


class TestLikelihood:
    def test_poisson_vs_scipy(self):
        import scipy.stats as st

        model = make_gaussian_model()
        key = jax.random.key(0)
        locs = jax.random.uniform(key, (4, 2), minval=0.0, maxval=8.0)
        fluxes = jnp.asarray([900.0, 1500.0, 300.0, 0.0])
        rate = np.asarray(model.render(locs, fluxes), dtype=np.float64)
        img = np.round(rate + 5.0)
        ours = model.loglikelihood(jnp.asarray(img, dtype=jnp.float32), locs, fluxes)
        expected = st.poisson(rate).logpmf(img).sum()
        np.testing.assert_allclose(float(ours), expected, rtol=3e-3)

    def test_poisson_normal_tail(self):
        model = make_gaussian_model().replace(background=jnp.float32(60000.0))
        locs = jnp.zeros((1, 2)) + 4.0
        fluxes = jnp.zeros((1,))
        img = jnp.full((8, 8), 60100.0)
        ours = float(model.loglikelihood(img, locs, fluxes))
        # Normal(rate, sqrt(rate)) approximation
        expected = (
            -0.5 * (100.0**2 / 60000.0)
            - 0.5 * np.log(60000.0)
            - 0.5 * np.log(2 * np.pi)
        ) * 64
        np.testing.assert_allclose(ours, expected, rtol=1e-5)

    def test_gaussian_likelihood_vs_scipy(self):
        import scipy.stats as st

        model = M71ImageModel(image_height=8, image_width=8, **M71_PARAMS)
        key = jax.random.key(1)
        locs = jax.random.uniform(key, (3, 2), minval=-2.0, maxval=10.0)
        fluxes = jnp.asarray([5.0, 1.0, 40.0])
        rate = np.asarray(model.render(locs, fluxes), dtype=np.float64)
        img = rate + 3.0
        ours = model.loglikelihood(jnp.asarray(img, dtype=jnp.float32), locs, fluxes)
        expected = st.norm(rate, np.sqrt(1.94 * rate)).logpdf(img).sum()
        np.testing.assert_allclose(float(ours), expected, rtol=3e-3)


class TestSDSSPSF:
    def test_normalization_constant_positive_and_profile_decreasing(self):
        psf = SDSSPSF.create(M71_PSF_PARAMS, psf_radius=8)
        assert float(psf.normalizing_constant) > 0
        r2 = jnp.asarray([0.0, 1.0, 4.0, 16.0, 64.0])
        vals = np.asarray(psf.normalized(r2))
        assert (np.diff(vals) < 0).all()

    def test_wing_beta3_fast_path_matches_general(self):
        # beta = 3 (every repo config): the wing is computed as
        # rsqrt((1+x)^3) instead of a pow — must agree with the general
        # path to f32 rounding, and only engage for concrete beta == 3
        psf = SDSSPSF.create(M71_PSF_PARAMS, psf_radius=8)
        assert psf.wing_beta3
        general = psf.replace(wing_beta3=False)
        r2 = jnp.linspace(0.0, 300.0, 3001)
        a = np.asarray(psf.normalized(r2))
        b = np.asarray(general.normalized(r2))
        np.testing.assert_allclose(a, b, rtol=1e-6)
        off = tuple(
            p if i != 3 else 2.9 for i, p in enumerate(M71_PSF_PARAMS)
        )
        assert not SDSSPSF.create(off, psf_radius=8).wing_beta3
        # traced construction (the LBFGS PSF-fit path) must fall back
        traced = jax.jit(
            lambda pp: SDSSPSF.create(tuple(pp), 8).normalized(r2)
        )(jnp.asarray(M71_PSF_PARAMS))
        np.testing.assert_allclose(np.asarray(traced), b, rtol=1e-6)


class TestReferenceParity:
    def test_gaussian_loglik_matches_reference(self):
        from reference_harness import load_reference

        smcdet = load_reference()
        import torch

        model = make_gaussian_model()
        ref_model = smcdet.images.ImageModel(
            image_height=8,
            image_width=8,
            background=200.0,
            psf_radius=8,
            psf_stdev=0.93,
        )
        rng = np.random.default_rng(7)
        locs = rng.uniform(-2, 10, size=(1, 1, 6, 3, 2)).astype(np.float32)
        fluxes = rng.uniform(100, 3000, size=(1, 1, 6, 3)).astype(np.float32)
        img = rng.poisson(250.0, size=(8, 8)).astype(np.float32)

        ref_ll = ref_model.loglikelihood(
            torch.tensor(img).view(1, 1, 8, 8),
            torch.tensor(locs),
            torch.tensor(fluxes),
        )
        ours = model.loglikelihood(
            jnp.asarray(img), jnp.asarray(locs), jnp.asarray(fluxes)
        )
        # rtol covers float32 accumulation-order + gammaln implementation
        # differences between XLA and torch (observed ~1.2e-4 on 64-pixel
        # sums of O(40) terms).
        np.testing.assert_allclose(
            np.asarray(ours)[0, 0], ref_ll.numpy()[0, 0], rtol=5e-4
        )

    def test_m71_loglik_matches_reference(self):
        from reference_harness import load_reference

        smcdet = load_reference()
        import torch

        model = M71ImageModel(image_height=8, image_width=8, **M71_PARAMS)
        ref_model = smcdet.images.M71ImageModel(
            image_height=8,
            image_width=8,
            background=M71_PARAMS["background"],
            psf_radius=8,
            adu_per_nmgy=M71_PARAMS["adu_per_nmgy"],
            psf_params=torch.tensor(M71_PSF_PARAMS),
            noise_additive=0.0,
            noise_multiplicative=1.94,
        )
        # normalising constants agree
        np.testing.assert_allclose(
            float(model.psf.normalizing_constant),
            float(ref_model.psf_normalizing_constant),
            rtol=1e-4,
        )
        rng = np.random.default_rng(11)
        locs = rng.uniform(-4, 12, size=(1, 1, 5, 4, 2)).astype(np.float32)
        fluxes = rng.uniform(0.3, 100.0, size=(1, 1, 5, 4)).astype(np.float32)
        img = rng.normal(900.0, 40.0, size=(8, 8)).astype(np.float32)

        ref_ll = ref_model.loglikelihood(
            torch.tensor(img).view(1, 1, 8, 8),
            torch.tensor(locs),
            torch.tensor(fluxes),
        )
        ours = model.loglikelihood(
            jnp.asarray(img), jnp.asarray(locs), jnp.asarray(fluxes)
        )
        np.testing.assert_allclose(
            np.asarray(ours)[0, 0], ref_ll.numpy()[0, 0], rtol=2e-4
        )


class TestSimulator:
    @pytest.mark.slow
    def test_generate_images_shapes_and_prune(self):
        prior = ParetoStarPrior(
            min_objects=0,
            max_objects=8,
            image_height=8,
            image_width=8,
            flux_scale=570.0,
            flux_alpha=0.96,
            pad=2.0,
        )
        model = make_gaussian_model()
        sim = generate_images(
            jax.random.key(0),
            prior,
            model,
            flux_threshold=634.0,
            loc_threshold_lower=0.0,
            loc_threshold_upper=8.0,
            num_images=64,
        )
        assert sim.images.shape == (64, 8, 8)
        assert sim.pruned_locs.shape == (64, 8, 2)
        assert (np.asarray(sim.pruned_counts) <= np.asarray(sim.unpruned_counts)).all()
        # pruned slots compacted: first pruned_counts slots have flux > threshold
        pc = np.asarray(sim.pruned_counts)
        pf = np.asarray(sim.pruned_fluxes)
        for i in range(64):
            assert (pf[i, : pc[i]] > 634.0).all()
            assert (pf[i, pc[i] :] == 0).all()

    def test_m71_simulator_runs(self):
        prior = M71Prior(
            min_objects=0,
            max_objects=20,
            counts_rate=0.03,
            image_height=8,
            image_width=8,
            flux_alpha=0.214,
            flux_lower=0.252,
            flux_upper=1804.679,
            pad=4.0,
        )
        model = M71ImageModel(image_height=8, image_width=8, **M71_PARAMS)
        sim = generate_images(
            jax.random.key(3), prior, model, 1.0, 0.0, 8.0, num_images=8
        )
        assert bool(jnp.isfinite(sim.images).all())
