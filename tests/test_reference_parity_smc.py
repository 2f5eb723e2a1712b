"""Full-sampler statistical parity against the reference implementation.

Runs the reference PyTorch ``SMCsampler`` (imported as a test oracle only)
and our CS-SMC on the same two-star image with matched configurations and
compares posterior summaries. Different RNGs make bit-equality impossible;
agreement within Monte Carlo tolerance on flux/location posteriors is the
parity criterion (SURVEY.md §7 "Hard parts").

The configuration is saturated (min_objects == max_objects == 2) because
the reference's mutation kernel asserts all fluxes lie in the truncation
box, which its own padded zero-slots violate for non-saturated priors —
all current reference experiments are saturated for this reason
(experiments/basic/run_smc.py:58-60).
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smcdet_tpu.inference.kernels import SingleComponentMH
from smcdet_tpu.inference.smc import SMCConfig, run_csmc
from smcdet_tpu.models.imaging import ImageModel
from smcdet_tpu.models.priors import (
    NormalFlux,
    PointProcessPrior,
    UniformCounts,
)
from smcdet_tpu.models.psf import GaussianPSF
from tests.reference_harness import load_reference

DIM = 8


def _sorted_mean_locs(locs, w):
    locs = np.asarray(locs)
    order = np.argsort(locs[:, :, 0], axis=1)
    s = np.take_along_axis(locs, order[:, :, None], axis=1)
    return (np.asarray(w)[:, None, None] * s).sum(0)


@pytest.mark.slow
def test_posterior_matches_reference_torch_sampler():
    smcdet = load_reference()
    import torch

    import smcdet.images
    import smcdet.kernel
    import smcdet.prior
    import smcdet.sampler

    prior = PointProcessPrior(
        min_objects=2,
        max_objects=2,
        image_height=DIM,
        image_width=DIM,
        pad=1.0,
        counts=UniformCounts(2, 2),
        flux=NormalFlux(mean=jnp.float32(2000.0), stdev=jnp.float32(200.0)),
    )
    model = ImageModel(
        height=DIM,
        width=DIM,
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
    image = model.sample(
        jax.random.key(42),
        jnp.asarray([[2.0, 2.5], [5.5, 5.0]]),
        jnp.asarray([2000.0, 2100.0]),
    )

    torch.manual_seed(0)
    ref = smcdet.sampler.SMCsampler(
        image=torch.tensor(np.asarray(image)),
        tile_dim=DIM,
        Prior=smcdet.prior.StarPrior(
            min_objects=2,
            max_objects=2,
            image_height=DIM,
            image_width=DIM,
            flux_mean=2000.0,
            flux_stdev=200.0,
            pad=1,
        ),
        ImageModel=smcdet.images.ImageModel(
            image_height=DIM,
            image_width=DIM,
            background=100.0,
            psf_radius=4,
            psf_stdev=1.0,
        ),
        MutationKernel=smcdet.kernel.SingleComponentMH(
            num_iters=20,
            locs_stdev=0.25,
            fluxes_stdev=50.0,
            fluxes_min=100.0,
            fluxes_max=5000.0,
        ),
        num_catalogs=512,
        ess_threshold_prop=0.5,
        resample_method="multinomial",
        flux_detection_threshold=200.0,
        max_smc_iters=100,
        print_every=10**9,
    )
    ref.run()
    ref_flux = ref.fluxes[0, 0].sum(-1).numpy()
    ref_w = ref.weights[0, 0].numpy()

    cfg = SMCConfig(
        num_catalogs=512,
        resample_method="multinomial",
        max_smc_iters=100,
        flux_detection_threshold=200.0,
    )
    ours = jax.jit(run_csmc)(
        jax.random.key(0), image[None], prior, model, kernel, cfg
    )
    our_flux = np.asarray(ours.fluxes[0]).sum(-1)
    our_w = np.asarray(ours.weights[0])

    # same adaptive tempering trajectory length
    assert abs(int(ours.num_iters) - int(ref.iter)) <= 2

    # posterior mean total flux within MC tolerance
    m_ref = float((ref_w * ref_flux).sum())
    m_ours = float((our_w * our_flux).sum())
    assert abs(m_ref - m_ours) < 40.0, (m_ref, m_ours)

    # flux quantiles agree
    q_ref = np.percentile(ref_flux, [10, 50, 90])
    q_ours = np.percentile(our_flux, [10, 50, 90])
    np.testing.assert_allclose(q_ours, q_ref, atol=50.0)

    # mean (sorted) star locations agree to sub-pixel
    locs_ref = _sorted_mean_locs(ref.locs[0, 0].numpy(), ref_w)
    locs_ours = _sorted_mean_locs(np.asarray(ours.locs[0]), our_w)
    np.testing.assert_allclose(locs_ours, locs_ref, atol=0.1)


@pytest.mark.slow
def test_count_posterior_matches_reference_nonsaturated(monkeypatch):
    """Head-to-head count-pmf parity on a *non-saturated* prior
    (min_objects < max_objects) — the CS-SMC point, p_hat(s | x).

    The reference crashes or silently degenerates on non-saturated
    configs out of the box, so three minimal in-test patches make it
    runnable without changing its math on the intended state space:

    1. ``TruncatedDiagonalMVN.log_prob`` asserts every value lies in the
       truncation box (distributions.py:51), but the kernel evaluates it
       on whole padded flux tensors whose inactive zero-slots sit below
       ``fluxes_min`` (kernel.py:76-88) before masking the result by the
       chosen component. Patch: clamp into the box — exact for in-box
       values; out-of-box entries are multiplied by 0 afterwards.
    2. The kernel's component multinomial picks among ALL ``max_objects``
       slots (kernel.py:36-44), so an inactive slot can receive a
       proposed flux >= fluxes_min: a phantom star whose photons enter
       the likelihood with no prior penalty (the count mask zeroes its
       prior term, prior.py:152-154). Patch: the prior returns -inf
       whenever an inactive slot carries nonzero flux, so phantom moves
       are always rejected — enforcing the delta-at-zero padding measure
       the reference's own initialisation and pruning assume.
    3. ``num_catalogs`` doubles as the per-stratum init size AND the
       resample draw count/clamp bound (sampler.py:128-150), so with
       ``C`` strata the first resample clamps ancestor indices drawn
       from the ``C*N``-particle population into ``[0, N)`` — which is
       entirely the count-0 stratum (strata are laid out in count
       order), collapsing the posterior onto count 0 in one step.
       Patch: after ``initialize()`` set ``num_catalogs`` and
       ``ess_threshold`` to the full population, driving the sampler's
       own phase methods in exactly ``run()``'s order (sampler.py:221-252)
       since ``run()`` would re-initialize.

    Parity criterion: total-variation distance between the reference's
    final count frequencies and our softmax(log_z) stratum pmf within
    Monte Carlo tolerance.
    """
    smcdet = load_reference()
    import torch

    import smcdet.distributions
    import smcdet.images
    import smcdet.kernel
    import smcdet.prior
    import smcdet.sampler

    def clamped_log_prob(self, value):
        v = value.clamp(min=self.lb, max=self.ub)
        return self.base_dist.log_prob(v) - self.log_prob_in_box

    monkeypatch.setattr(
        smcdet.distributions.TruncatedDiagonalMVN,
        "log_prob",
        clamped_log_prob,
    )

    orig_log_prob = smcdet.prior.StarPrior.log_prob

    def guarded_log_prob(self, counts, locs, fluxes):
        lp = orig_log_prob(self, counts, locs, fluxes)
        mask = torch.arange(self.max_objects) < counts.unsqueeze(-1)
        phantom = (~mask & (fluxes != 0)).any(-1)
        return torch.where(phantom, torch.tensor(float("-inf")), lp)

    monkeypatch.setattr(smcdet.prior.StarPrior, "log_prob", guarded_log_prob)

    MAXO = 3
    prior = PointProcessPrior(
        min_objects=0,
        max_objects=MAXO,
        image_height=DIM,
        image_width=DIM,
        pad=1.0,
        counts=UniformCounts(0, MAXO),
        flux=NormalFlux(mean=jnp.float32(2000.0), stdev=jnp.float32(200.0)),
    )
    model = ImageModel(
        height=DIM,
        width=DIM,
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
    image = model.sample(
        jax.random.key(42),
        jnp.asarray([[2.0, 2.5], [5.5, 5.0], [0.0, 0.0]]),
        jnp.asarray([2000.0, 2100.0, 0.0]),
    )

    torch.manual_seed(0)
    ref = smcdet.sampler.SMCsampler(
        image=torch.tensor(np.asarray(image)),
        tile_dim=DIM,
        Prior=smcdet.prior.StarPrior(
            min_objects=0,
            max_objects=MAXO,
            image_height=DIM,
            image_width=DIM,
            flux_mean=2000.0,
            flux_stdev=200.0,
            pad=1,
        ),
        ImageModel=smcdet.images.ImageModel(
            image_height=DIM,
            image_width=DIM,
            background=100.0,
            psf_radius=4,
            psf_stdev=1.0,
        ),
        MutationKernel=smcdet.kernel.SingleComponentMH(
            num_iters=20,
            locs_stdev=0.25,
            fluxes_stdev=50.0,
            fluxes_min=100.0,
            fluxes_max=5000.0,
        ),
        num_catalogs=1024,
        ess_threshold_prop=0.5,
        resample_method="multinomial",
        flux_detection_threshold=200.0,
        max_smc_iters=100,
        print_every=10**9,
    )
    # run()'s phase order (sampler.py:221-252) with the patch-3 population
    # correction applied after initialize()
    ref.initialize()
    population = ref.counts.shape[-1]
    assert population == (MAXO + 1) * 1024
    ref.num_catalogs = population
    ref.ess_threshold = 0.5 * population
    ref.temper()
    ref.update_weights()
    iters = 0
    while torch.any(ref.temperature < 1) and iters <= 100:
        iters += 1
        ref.resample()
        ref.mutate()
        ref.temper()
        ref.update_weights()
    ref.resample()
    # after the terminal resample the weights are uniform; the count pmf
    # is the frequency of intrinsic catalog counts
    ref_counts = ref.counts[0, 0].numpy().astype(int)
    ref_pmf = np.bincount(ref_counts, minlength=MAXO + 1) / ref_counts.size

    cfg = SMCConfig(
        num_catalogs=1024,
        resample_method="multinomial",
        max_smc_iters=100,
        flux_detection_threshold=200.0,
    )
    ours = jax.jit(run_csmc)(
        jax.random.key(0), image[None], prior, model, kernel, cfg
    )
    lz = np.asarray(ours.log_normalizing_constant[0])
    our_pmf = np.exp(lz - lz.max())
    our_pmf /= our_pmf.sum()

    assert np.argmax(our_pmf) == np.argmax(ref_pmf) == 2
    tvd = 0.5 * np.abs(our_pmf - ref_pmf).sum()
    assert tvd < 0.15, (our_pmf, ref_pmf, tvd)
