"""Tests for the fused Pallas MH-sweep kernel (ops/pallas_sweep.py).

These only run when a real TPU is attached (the CPU test mesh cannot lower
Mosaic kernels); CI covers the XLA path, and the driver's bench runs
exercise this one. Correctness is statistical: the kernel uses its own
PRNG stream, so we compare equilibrium summaries against the XLA path,
plus deterministic checks of the shared special-function math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcdet_tpu.ops.pallas_sweep import _erf_poly, _ndtr

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs a TPU chip"
)


class TestSpecialFunctions:
    def test_erf_poly_accuracy(self):
        # the in-kernel Phi must match jax's to ~1.5e-7 so the XLA and
        # Pallas proposal densities are interchangeable diagnostics
        x = jnp.linspace(-4.0, 4.0, 4001)
        np.testing.assert_allclose(
            np.asarray(_erf_poly(x)),
            np.asarray(jax.lax.erf(x)),
            atol=5e-6,  # 1.5e-7 polynomial error + TPU f32 exp rounding
        )

    def test_ndtr_matches_scipy(self):
        from scipy.stats import norm

        z = np.linspace(-5.0, 5.0, 101)
        np.testing.assert_allclose(
            np.asarray(_ndtr(jnp.asarray(z, dtype=jnp.float32))),
            norm.cdf(z),
            atol=1e-6,
        )


@requires_tpu
class TestFusedSweepOnTPU:
    def _setup(self, noise):
        from smcdet_tpu.inference.kernels import SingleComponentMH, TargetContext
        from smcdet_tpu.models.imaging import ImageModel, M71ImageModel
        from smcdet_tpu.models.priors import (
            M71Prior,
            NormalFlux,
            PointProcessPrior,
            UniformCounts,
        )
        from smcdet_tpu.models.psf import GaussianPSF

        if noise == "gaussian":
            prior = M71Prior(
                min_objects=0, max_objects=4, counts_rate=0.03,
                image_height=8, image_width=8, flux_alpha=0.214,
                flux_lower=0.252, flux_upper=1804.679, pad=1.0,
            )
            model = M71ImageModel(
                image_height=8, image_width=8, background=865.0,
                adu_per_nmgy=856.0,
                psf_params=(1.51, 4.85, 1.32, 3.0, 0.09, 0.002),
                psf_radius=8, noise_multiplicative=1.94,
            )
            kw = dict(fluxes_min=jnp.float32(0.252),
                      fluxes_max=jnp.float32(1804.679),
                      fluxes_stdev=jnp.float32(5.0))
        else:
            prior = PointProcessPrior(
                min_objects=0, max_objects=4, image_height=8, image_width=8,
                pad=1.0, counts=UniformCounts(0, 4),
                flux=NormalFlux(mean=jnp.float32(2000.0),
                                stdev=jnp.float32(300.0)),
            )
            model = ImageModel(
                height=8, width=8, psf_radius=4, noise="poisson",
                background=jnp.float32(100.0),
                psf=GaussianPSF(stdev=jnp.float32(1.0)),
            )
            kw = dict(fluxes_min=jnp.float32(500.0),
                      fluxes_max=jnp.float32(5000.0),
                      fluxes_stdev=jnp.float32(60.0))
        kernel = SingleComponentMH(
            num_iters=40, locs_stdev=jnp.float32(0.25), **kw
        )
        T, C, N = 2, 5, 256
        key = jax.random.key(0)
        strata, locs, fluxes = prior.sample_stratified(key, N, (T,))
        counts = jnp.broadcast_to(strata[None, :, None], (T, C, N))
        images = jnp.abs(
            model.sample(
                jax.random.key(1),
                locs[:, -1, 0],
                fluxes[:, -1, 0],
            )
        )
        ctx = TargetContext(
            prior=prior, model=model, image=images[:, None, None],
            temperature=jnp.full((T, 1, 1), 0.8),
        )
        return kernel, ctx, counts, locs, fluxes, model, prior, images

    @pytest.mark.parametrize("noise", ["gaussian", "poisson"])
    def test_matches_xla_equilibrium(self, noise):
        kernel, ctx, counts, locs, fluxes, model, prior, images = (
            self._setup(noise)
        )
        # 800 sweeps: the two backends use different PRNG streams, so the
        # comparison must be made at (near-)equilibrium. At 40 sweeps the
        # chains are mid-warm-up and the XLA chain's own seed-to-seed q25
        # spread (~270 nats on the gaussian/Pareto target) exceeds any
        # sane tolerance (experiments/diag_pallas_mh.py, round 4). By 800
        # sweeps the bulk quantiles are reproducible to ~2 nats across
        # seeds; the deep lower tail (q25) stays warm-up-dominated for
        # thousands of sweeps (heavy Pareto flux tail) and is excluded.
        kernel = kernel.replace(num_iters=800)
        kx = kernel.replace(backend="xla")
        kp = kernel.replace(backend="pallas")
        stx, accx = jax.jit(
            lambda k, l, f: kx.run(k, ctx, counts, l, f)
        )(jax.random.key(5), locs, fluxes)
        stp, accp = jax.jit(
            lambda k, l, f: kp.run(k, ctx, counts, l, f)
        )(jax.random.key(5), locs, fluxes)

        # equilibrated-bulk quantiles agree (statistical equivalence).
        # The poisson target's q75 sits in a density gap between count
        # strata (q50 = -5034, q90 = -445): measured same-backend
        # seed-to-seed spread there is 30-100 nats while q50/q90 are
        # stable to <1/<10 nats, so q90 is probed instead (round 5).
        ltx = np.asarray(stx.logprior + 0.8 * stx.parent_ll).ravel()
        ltp = np.asarray(stp.logprior + 0.8 * stp.parent_ll).ravel()
        for q in (50, 75) if noise == "gaussian" else (50, 90):
            a, b = np.percentile(ltx, q), np.percentile(ltp, q)
            assert abs(a - b) <= 0.05 * abs(a) + 5.0, (q, a, b)

        # acceptance rates match (sensitive to proposal-mass-correction
        # bias: a wrong truncation term shifts acceptance systematically)
        assert abs(float(accp.mean()) - float(accx.mean())) < 0.02, (
            float(accx.mean()), float(accp.mean()),
        )

        # caches remain consistent with full recomputation
        pll = model.loglikelihood(ctx.image, stp.locs, stp.fluxes)
        drift = np.abs(np.asarray(pll - stp.parent_ll))
        scale = np.maximum(np.abs(np.asarray(pll)), 1.0)
        # f32 incremental accumulation drift over num_iters sweeps
        assert (drift / scale).max() < 2e-3
        lp = prior.log_prob(counts, stp.locs, stp.fluxes)
        assert np.abs(np.asarray(lp - stp.logprior)).max() < 0.01

    def test_inactive_slots_untouched(self):
        kernel, ctx, counts, locs, fluxes, *_ = self._setup("gaussian")
        kp = kernel.replace(backend="pallas")
        stp, _ = jax.jit(
            lambda k, l, f: kp.run(k, ctx, counts, l, f)
        )(jax.random.key(6), locs, fluxes)
        M = fluxes.shape[-1]
        inactive = ~(jnp.arange(M) < counts[..., None])
        np.testing.assert_array_equal(
            np.asarray(stp.fluxes)[np.asarray(inactive)],
            np.asarray(fluxes)[np.asarray(inactive)],
        )

    @pytest.mark.parametrize("noise", ["gaussian", "poisson"])
    def test_packed_layout_matches_classic(self, noise):
        """The (8,128) sublane-packed particle layout (round 5, ~1.8x
        end-to-end) is the same math as the lane-major layout — check a
        bit-exact zero-count passthrough (validates the 4-D block
        plumbing) and equilibrium statistics at 400 sweeps."""
        from smcdet_tpu.inference.kernels import init_kernel_state
        from smcdet_tpu.ops import pallas_sweep

        kernel, ctx, counts, locs, fluxes, model, prior, images = (
            self._setup(noise)
        )
        kernel = kernel.replace(num_iters=400)

        zc = jnp.zeros_like(counts)
        zstate = init_kernel_state(ctx, zc, locs, fluxes)
        for lay in ("classic", "packed"):
            o = pallas_sweep.pallas_mh_sweeps(
                jax.random.key(2), ctx, kernel, zc, locs, fluxes,
                zstate.rate, zstate.parent_ll, zstate.logprior,
                layout=lay,
            )
            lo, fo, ro, po, lpo, acc, _, _ = o
            assert jnp.array_equal(lo, locs), lay
            assert jnp.array_equal(fo, fluxes), lay
            assert jnp.array_equal(ro, zstate.rate), lay
            assert float(jnp.max(acc)) == 0.0, lay

        state = init_kernel_state(ctx, counts, locs, fluxes)
        res = {}
        for lay in ("classic", "packed"):
            o = pallas_sweep.pallas_mh_sweeps(
                jax.random.key(3), ctx, kernel, counts, locs, fluxes,
                state.rate, state.parent_ll, state.logprior, layout=lay,
            )
            _, fo, _, po, lpo, acc, _, _ = o
            res[lay] = (
                float(acc.mean()), float(po.mean()), float(lpo.mean()),
                float(fo.mean()),
            )
        for a, b in zip(res["classic"], res["packed"]):
            assert abs(a - b) <= 0.05 * max(abs(a), abs(b), 1e-3), res


class TestBridgeMALAGradientMath:
    """CPU-checkable derivation of the fused bridge-MALA kernel's
    closed-form gradient: with the bridge target
    ``lp + tau * pll + (1 - tau) * cll`` and the child rate the
    side-masked render, the slot gradient is the parent expression plus
    the same render derivatives masked by the (gradient-transparent)
    side window, weighted ``(1 - tau) * dll(child_rate)``. This is what
    ``_make_mala_kernel(child_axis=...)`` implements; ``jax.grad`` of
    the XLA slot target is the oracle."""

    def test_analytic_bridge_gradient_matches_autodiff(self):
        from smcdet_tpu.inference.aggregate import _side_mask_fn
        from smcdet_tpu.inference.kernels import (
            SingleComponentMALA,
            _take_slot,
            init_kernel_state,
        )

        helper = TestFusedSweepOnTPU()
        _, ctx, counts, locs, fluxes, model, prior, _ = helper._setup(
            "gaussian"
        )
        side_mask = _side_mask_fn(1, 4, model.height, model.width)
        sides = (jnp.arange(fluxes.shape[-1]) % 2).astype(jnp.float32)
        sides = jnp.broadcast_to(sides, fluxes.shape)
        ctx = ctx.replace(
            temperature=jnp.full((2, 1, 1), 0.6),
            child_model=model,
            child_side_mask=side_mask,
            child_slot_side=sides,
            child_ghost_rate=jnp.zeros(
                fluxes.shape[:-1] + (model.height * model.width,)
            ),
        )
        kernel = SingleComponentMALA(
            num_iters=1, locs_step=jnp.float32(0.1),
            fluxes_step=jnp.float32(2.0),
            fluxes_min=jnp.float32(0.252), fluxes_max=jnp.float32(1804.679),
        )
        st = init_kernel_state(ctx, counts, locs, fluxes)
        j = jnp.zeros(counts.shape, dtype=jnp.int32)
        active = j < counts
        onehot = jnp.arange(fluxes.shape[-1]) == j[..., None]
        loc_j = _take_slot(locs, onehot)
        f_j = _take_slot(fluxes, onehot)
        side_j = _take_slot(sides, onehot)
        eff = jnp.asarray(model.adu_per_nmgy)
        old_img, old_child = ctx.star_images(loc_j, side_j)
        a = active[..., None]
        rate_wo = st.rate - jnp.where(a, eff * f_j[..., None] * old_img, 0.0)
        child_rate_wo = st.child_rate - jnp.where(
            a, eff * f_j[..., None] * old_child, 0.0
        )
        ref_pt = prior.flux.reference_point
        safe = jnp.where(active, f_j, ref_pt)
        logprior_wo = st.logprior - jnp.where(
            active, prior.flux.log_prob(safe), 0.0
        )
        base = (rate_wo, child_rate_wo, logprior_wo)

        grad_fn = jax.grad(
            kernel._slot_target, argnums=(3, 4), has_aux=True
        )
        (gl_auto, gf_auto), _ = grad_fn(
            ctx, base, active, loc_j, f_j, side_j
        )

        # closed-form replica of the fused kernel's bridge gradient
        def dll(rate):
            var = jnp.asarray(model.noise_additive) + jnp.asarray(
                model.noise_multiplicative
            ) * rate
            r = ctx.image_flat - rate
            mult = jnp.asarray(model.noise_multiplicative)
            return r / var + 0.5 * r * r * mult / var**2 - 0.5 * mult / var

        psf = model.psf
        H, W = model.height, model.width
        p = jnp.arange(H * W)
        h = (p // W) + 0.5
        w = (p % W) + 0.5
        dy = h - loc_j[..., 0:1]
        dx = w - loc_j[..., 1:2]
        in_h = (
            jnp.abs(h - 0.5 - jnp.floor(loc_j[..., 0:1])) <= model.psf_radius
        )
        in_w = (
            jnp.abs(w - 0.5 - jnp.floor(loc_j[..., 1:2])) <= model.psf_radius
        )
        mask = (in_h & in_w).astype(jnp.float32)
        r2 = dy * dy + dx * dx
        s1, s2, sp, beta, bb, p0 = (
            psf.sigma1, psf.sigma2, psf.sigmap, psf.beta, psf.b, psf.p0
        )
        norm = (1.0 + bb + p0) * psf.normalizing_constant
        t1 = jnp.exp(-r2 / (2 * s1))
        t2 = bb * jnp.exp(-r2 / (2 * s2))
        t3 = p0 * (1.0 + r2 / (beta * sp)) ** (-beta / 2.0)
        psi = (t1 + t2 + t3) / norm * mask
        dpsi = (
            t1 * (-1.0 / (2 * s1))
            + t2 * (-1.0 / (2 * s2))
            + t3 * (-0.5) / (sp + r2 / beta)
        ) / norm * mask
        wchild = ctx._side_window(side_j).astype(jnp.float32)
        tau = ctx.temperature[..., None]
        g = tau * dll(st.rate) + (1.0 - tau) * dll(st.child_rate) * wchild
        aeff = active[..., None].astype(jnp.float32) * eff
        gly = (g * dpsi * (-2.0 * dy)).sum(-1) * aeff[..., 0] * f_j
        glx = (g * dpsi * (-2.0 * dx)).sum(-1) * aeff[..., 0] * f_j
        flux_grad = -(jnp.asarray(prior.flux.alpha) + 1.0) / safe
        gf = (g * psi).sum(-1) * aeff[..., 0] + jnp.where(
            active, flux_grad, 0.0
        )
        np.testing.assert_allclose(
            np.asarray(gly), np.asarray(gl_auto[..., 0]), rtol=2e-2,
            atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(glx), np.asarray(gl_auto[..., 1]), rtol=2e-2,
            atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gf_auto), rtol=2e-2, atol=2e-4
        )


@requires_tpu
class TestFusedBridgeOnTPU:
    def test_aggregation_matches_xla_backend(self):
        from smcdet_tpu.inference import Aggregate, SMCSampler
        from smcdet_tpu.inference.kernels import SingleComponentMH
        from smcdet_tpu.models.imaging import ImageModel
        from smcdet_tpu.models.priors import (
            NormalFlux,
            PointProcessPrior,
            UniformCounts,
        )
        from smcdet_tpu.models.psf import GaussianPSF

        prior = PointProcessPrior(
            min_objects=0, max_objects=3, image_height=8, image_width=8,
            pad=1.0, counts=UniformCounts(0, 3),
            flux=NormalFlux(mean=jnp.float32(2000.0),
                            stdev=jnp.float32(300.0)),
        )
        model = ImageModel(
            height=8, width=8, psf_radius=4, noise="poisson",
            background=jnp.float32(100.0),
            psf=GaussianPSF(stdev=jnp.float32(1.0)),
        )
        full = model.replace(height=16, width=16)
        image = full.sample(
            jax.random.key(9),
            jnp.asarray([[3.0, 3.5], [12.5, 4.0], [8.0, 11.5]]),
            jnp.asarray([2000.0, 2200.0, 2400.0]),
        )
        fluxes = {}
        for backend in ("xla", "pallas"):
            kernel = SingleComponentMH(
                num_iters=20, locs_stdev=jnp.float32(0.25),
                fluxes_stdev=jnp.float32(60.0),
                fluxes_min=jnp.float32(500.0),
                fluxes_max=jnp.float32(5000.0), backend=backend,
            )
            s = SMCSampler(
                image=image, tile_dim=8, Prior=prior, ImageModel=model,
                MutationKernel=kernel, num_catalogs=192,
                flux_detection_threshold=600.0, max_smc_iters=50,
                resample_method="systematic",
            )
            s.run(jax.random.key(1))
            agg = Aggregate.from_smc(s)
            agg.run(jax.random.key(2))
            pc = np.asarray(agg.pruned_counts[0, 0])
            vals, freq = np.unique(pc, return_counts=True)
            assert vals[freq.argmax()] == 3
            fluxes[backend] = float(agg.posterior_mean_total_flux()[0, 0])
        # same posterior within MC tolerance (truth: 6600)
        assert abs(fluxes["xla"] - fluxes["pallas"]) < 0.05 * 6600.0, fluxes


@requires_tpu
class TestFusedMALAOnTPU:
    """The fused MALA kernel (analytic slot gradients) vs the jax.grad
    XLA path: same stationary behaviour, consistent caches."""

    @pytest.mark.parametrize("noise", ["gaussian", "poisson"])
    def test_matches_xla_equilibrium(self, noise):
        from smcdet_tpu.inference.kernels import SingleComponentMALA

        helper = TestFusedSweepOnTPU()
        kernel_mh, ctx, counts, locs, fluxes, model, prior, images = (
            helper._setup(noise)
        )
        if noise == "gaussian":
            steps = dict(locs_step=jnp.float32(0.12),
                         fluxes_step=jnp.float32(2.0))
        else:
            steps = dict(locs_step=jnp.float32(0.12),
                         fluxes_step=jnp.float32(25.0))
        kx = SingleComponentMALA(
            num_iters=40,
            fluxes_min=kernel_mh.fluxes_min,
            fluxes_max=kernel_mh.fluxes_max,
            backend="xla",
            **steps,
        )
        kp = kx.replace(backend="pallas")
        stx, accx = jax.jit(
            lambda k, l, f: kx.run(k, ctx, counts, l, f)
        )(jax.random.key(5), locs, fluxes)
        stp, accp = jax.jit(
            lambda k, l, f: kp.run(k, ctx, counts, l, f)
        )(jax.random.key(5), locs, fluxes)

        # both move and accept at comparable rates (drifted proposals)
        assert float(accp.mean()) > 0.05
        assert abs(float(accp.mean()) - float(accx.mean())) < 0.15

        # tempered-target quantiles agree (statistical equivalence)
        ltx = np.asarray(stx.logprior + 0.8 * stx.parent_ll).ravel()
        ltp = np.asarray(stp.logprior + 0.8 * stp.parent_ll).ravel()
        for q in (25, 50, 75):
            a, b = np.percentile(ltx, q), np.percentile(ltp, q)
            assert abs(a - b) <= 0.05 * abs(a) + 5.0, (q, a, b)

        # caches remain consistent with full recomputation
        pll = model.loglikelihood(ctx.image, stp.locs, stp.fluxes)
        drift = np.abs(np.asarray(pll - stp.parent_ll))
        scale = np.maximum(np.abs(np.asarray(pll)), 1.0)
        assert (drift / scale).max() < 2e-3
        lp = prior.log_prob(counts, stp.locs, stp.fluxes)
        assert np.abs(np.asarray(lp - stp.logprior)).max() < 0.01

    @pytest.mark.parametrize("mode", ["tag", "legacy"])
    def test_matches_xla_equilibrium_bridge(self, mode):
        """MALA on the aggregation-bridge target (child term at tau=0.5):
        fused analytic-gradient kernel vs the jax.grad XLA oracle."""
        from smcdet_tpu.inference.aggregate import _side_mask_fn
        from smcdet_tpu.inference.kernels import (
            SingleComponentMALA,
            init_kernel_state,
        )

        helper = TestFusedSweepOnTPU()
        kernel_mh, ctx, counts, locs, fluxes, model, prior, images = (
            helper._setup("gaussian")
        )
        side_mask = _side_mask_fn(1, 4, model.height, model.width)
        kwargs = dict(child_model=model, child_side_mask=side_mask)
        if mode == "tag":
            sides = (jnp.arange(fluxes.shape[-1]) % 2).astype(jnp.float32)
            kwargs.update(
                child_slot_side=jnp.broadcast_to(sides, fluxes.shape),
                child_ghost_rate=jnp.zeros(
                    fluxes.shape[:-1] + (model.height * model.width,)
                ),
            )
        ctx = ctx.replace(
            temperature=jnp.full((2, 1, 1), 0.5), **kwargs
        )
        kx = SingleComponentMALA(
            num_iters=800,
            locs_step=jnp.float32(0.12),
            fluxes_step=jnp.float32(2.0),
            fluxes_min=kernel_mh.fluxes_min,
            fluxes_max=kernel_mh.fluxes_max,
            backend="xla",
        )
        kp = kx.replace(backend="pallas")
        stx, accx = jax.jit(
            lambda k, l, f: kx.run(k, ctx, counts, l, f)
        )(jax.random.key(5), locs, fluxes)
        stp, accp = jax.jit(
            lambda k, l, f: kp.run(k, ctx, counts, l, f)
        )(jax.random.key(5), locs, fluxes)

        assert float(accp.mean()) > 0.05
        assert abs(float(accp.mean()) - float(accx.mean())) < 0.02

        # equilibrated bridge-target quantiles agree everywhere EXCEPT
        # q50, which the round-5 sweeps curve
        # (docs/results/bridge_q50_curve.json, on-chip, 3 seeds,
        # 800-6400 sweeps) showed is not a usable backend statistic at
        # ANY length: the per-backend seed-to-seed q50 spread GROWS
        # with sweeps (69 -> 200 nats as chains wander between the
        # target's modes) and the cross-backend gap stays well inside
        # one spread at every rung (26/45/11/33 nats) with no trend —
        # i.e. no systematic bias, just a multimodal plateau. The
        # tails ARE tight at 800 sweeps: cross-backend gap <= 1.4 nats
        # at q10/q25 and <= 0.8 at q75/q90 across all rungs, so the
        # lower-tail coverage dropped in round 4 is restored here with
        # a 25-nat bound (3x the worst measured spread at those
        # quantiles).
        def lt(st):
            return np.asarray(
                st.logprior + 0.5 * st.parent_ll + 0.5 * st.child_ll
            ).ravel()

        ltx, ltp = lt(stx), lt(stp)
        for q in (10, 25):
            a, b = np.percentile(ltx, q), np.percentile(ltp, q)
            assert abs(a - b) <= 25.0, (q, a, b)
        for q in (75, 90):
            a, b = np.percentile(ltx, q), np.percentile(ltp, q)
            assert abs(a - b) <= 0.05 * abs(a) + 5.0, (q, a, b)

        # caches (incl. the child pair) equal a from-scratch recompute.
        # The rate caches accumulate one f32 increment per ACCEPTED sweep
        # (800 here), so the max relative drift is seed-dependent:
        # measured 1.5-3.2e-3 across PRNG streams (the packed layout's
        # different stream first tripped a 2e-3 bound at 3.1e-3).
        fresh = init_kernel_state(ctx, counts, stp.locs, stp.fluxes)
        for name in ("rate", "child_rate"):
            got = np.asarray(getattr(stp, name))
            want = np.asarray(getattr(fresh, name))
            scale = np.maximum(np.abs(want), 1.0)
            assert (np.abs(got - want) / scale).max() < 5e-3, name
        for name in ("parent_ll", "child_ll"):
            got = np.asarray(getattr(stp, name))
            want = np.asarray(getattr(fresh, name))
            scale = np.maximum(np.abs(want), 1.0)
            assert (np.abs(got - want) / scale).max() < 2e-3, name
        assert np.abs(
            np.asarray(fresh.logprior - stp.logprior)
        ).max() < 0.01

    def test_analytic_gradient_matches_autodiff(self):
        """The closed-form slot gradient the kernel implements must equal
        jax.grad of the XLA slot target (checked on CPU-side math with the
        same formulas, batch of random states)."""
        from smcdet_tpu.inference.kernels import (
            SingleComponentMALA,
            init_kernel_state,
        )

        helper = TestFusedSweepOnTPU()
        _, ctx, counts, locs, fluxes, model, prior, _ = helper._setup(
            "gaussian"
        )
        kernel = SingleComponentMALA(
            num_iters=1, locs_step=jnp.float32(0.1),
            fluxes_step=jnp.float32(2.0),
            fluxes_min=jnp.float32(0.252), fluxes_max=jnp.float32(1804.679),
        )
        st = init_kernel_state(ctx, counts, locs, fluxes)
        j = jnp.zeros(counts.shape, dtype=jnp.int32)
        active = j < counts
        onehot = jnp.arange(fluxes.shape[-1]) == j[..., None]
        from smcdet_tpu.inference.kernels import _take_slot

        loc_j = _take_slot(locs, onehot)
        f_j = _take_slot(fluxes, onehot)
        eff = jnp.asarray(model.adu_per_nmgy)
        old_img, _ = ctx.star_images(loc_j, None)
        a = active[..., None]
        rate_wo = st.rate - jnp.where(a, eff * f_j[..., None] * old_img, 0.0)
        ref_pt = prior.flux.reference_point
        safe = jnp.where(active, f_j, ref_pt)
        logprior_wo = st.logprior - jnp.where(
            active, prior.flux.log_prob(safe), 0.0
        )
        base = (rate_wo, None, logprior_wo)

        grad_fn = jax.grad(
            kernel._slot_target, argnums=(3, 4), has_aux=True
        )
        (gl_auto, gf_auto), _ = grad_fn(ctx, base, active, loc_j, f_j, None)

        # analytic replica (the formulas _make_mala_kernel implements)
        tau = ctx.temperature
        var = jnp.asarray(model.noise_additive) + jnp.asarray(
            model.noise_multiplicative
        ) * st.rate
        img_flat = ctx.image_flat
        r = img_flat - st.rate
        mult = jnp.asarray(model.noise_multiplicative)
        dll = r / var + 0.5 * r * r * mult / var**2 - 0.5 * mult / var
        psf = model.psf
        H, W = model.height, model.width
        p = jnp.arange(H * W)
        h = (p // W) + 0.5
        w = (p % W) + 0.5
        dy = h - loc_j[..., 0:1]
        dx = w - loc_j[..., 1:2]
        in_h = jnp.abs(h - 0.5 - jnp.floor(loc_j[..., 0:1])) <= model.psf_radius
        in_w = jnp.abs(w - 0.5 - jnp.floor(loc_j[..., 1:2])) <= model.psf_radius
        mask = (in_h & in_w).astype(jnp.float32)
        r2 = dy * dy + dx * dx
        s1, s2, sp, beta, bb, p0 = (
            psf.sigma1, psf.sigma2, psf.sigmap, psf.beta, psf.b, psf.p0
        )
        norm = (1.0 + bb + p0) * psf.normalizing_constant
        t1 = jnp.exp(-r2 / (2 * s1))
        t2 = bb * jnp.exp(-r2 / (2 * s2))
        t3 = p0 * (1.0 + r2 / (beta * sp)) ** (-beta / 2.0)
        psi = (t1 + t2 + t3) / norm * mask
        dpsi = (
            t1 * (-1.0 / (2 * s1))
            + t2 * (-1.0 / (2 * s2))
            + t3 * (-0.5) / (sp + r2 / beta)
        ) / norm * mask
        aeff = active[..., None].astype(jnp.float32) * eff
        g = tau[..., None] * dll
        gly = (g * dpsi * (-2.0 * dy)).sum(-1) * aeff[..., 0] * f_j
        glx = (g * dpsi * (-2.0 * dx)).sum(-1) * aeff[..., 0] * f_j
        # truncated-Pareto flux prior: d/df log p = -(alpha + 1) / f
        flux_grad = -(jnp.asarray(prior.flux.alpha) + 1.0) / safe
        gf = (g * psi).sum(-1) * aeff[..., 0] + jnp.where(
            active, flux_grad, 0.0
        )
        np.testing.assert_allclose(
            np.asarray(gly), np.asarray(gl_auto[..., 0]), rtol=2e-2,
            atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(glx), np.asarray(gl_auto[..., 1]), rtol=2e-2,
            atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gf_auto), rtol=2e-2, atol=2e-4
        )
