"""Model-hyperparameter fitting (the reference's data-prep MLE stage).

Re-implements the fitted-parameter pipeline of
/root/reference/experiments/m71/m71.ipynb:

- cell 31: truncated-Pareto flux-prior MLE (``scipy.stats.truncpareto.fit``)
  -> ``fit_truncated_pareto_flux``;
- cell 51: Poisson count-rate MLE -> ``fit_poisson_rate``;
- cells 86-94: joint MLE of the 6 SDSS PSF parameters, the Gaussian noise
  model (additive + multiplicative), and the nmgy->ADU calibration against
  a real image with known star positions/fluxes, run with LBFGS ->
  ``fit_image_model`` (optax.lbfgs on device instead of torch LBFGS on
  CPU).

The result dict mirrors the reference's ``params.pkl`` keys
(m71.ipynb cells 98-99).
"""

from __future__ import annotations

import warnings
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from smcdet_tpu.models.imaging import M71ImageModel

__all__ = [
    "fit_truncated_pareto_flux",
    "fit_poisson_rate",
    "fit_image_model",
    "FittedImageModel",
]


def fit_truncated_pareto_flux(fluxes, lower=None, upper=None):
    """MLE of the truncated-Pareto flux prior.

    Returns ``(alpha, lower, upper)``; bounds default to the sample range
    (the reference fits ``scipy.stats.truncpareto`` with the shape and
    scale free, m71.ipynb cell 31).
    """
    from scipy.stats import truncpareto

    fluxes = np.asarray(fluxes, dtype=np.float64)
    fluxes = fluxes[fluxes > 0]
    lower = float(fluxes.min()) if lower is None else float(lower)
    # scipy's truncpareto: pdf(x, b, c) ~ x^{-b-1} on [1, c], scaled
    if upper is None:
        b, c, loc, scale = truncpareto.fit(fluxes, floc=0.0, fscale=lower)
        return float(b), lower, float(c * lower)
    # fixed truncation point (e.g. the saturation limit): only the shape
    # is free. With a heavy tail (alpha ~ 0.2) the sample maximum is a
    # terrible upper-bound estimator — it fluctuates by orders of
    # magnitude between checkerboard halves. Samples outside the fixed
    # support would make the NLL infinite and the fit garbage, so filter
    # them here rather than relying on every caller to pre-mask.
    upper = float(upper)
    in_support = (fluxes >= lower) & (fluxes <= upper)
    if not in_support.all():
        dropped = int((~in_support).sum())
        warnings.warn(
            f"fit_truncated_pareto_flux: dropping {dropped} sample(s) "
            f"outside the fixed support [{lower:g}, {upper:g}]"
        )
        fluxes = fluxes[in_support]
    if fluxes.size == 0:
        raise ValueError(
            "fit_truncated_pareto_flux: no samples inside the fixed "
            f"support [{lower:g}, {upper:g}]"
        )
    b, c, loc, scale = truncpareto.fit(
        fluxes, fc=upper / lower, floc=0.0, fscale=lower
    )
    return float(b), lower, upper


def fit_poisson_rate(counts, area):
    """Poisson count-rate MLE: mean count per padded-tile area
    (m71.ipynb cell 51)."""
    counts = np.asarray(counts, dtype=np.float64)
    return float(counts.mean() / area)


class FittedImageModel(NamedTuple):
    psf_params: tuple
    background: float
    adu_per_nmgy: float
    noise_additive: float
    noise_multiplicative: float
    final_loss: float


def fit_image_model(
    image,
    locs,
    fluxes_nmgy,
    psf_params_init,
    background_init,
    adu_per_nmgy_init,
    psf_radius: int = 8,
    noise_additive_init: float = 1.0,
    noise_multiplicative_init: float = 1.0,
    num_steps: int = 200,
    fit_background: bool = False,
):
    """Joint MLE of PSF/noise/calibration against a real image.

    ``image``: ``[H, W]`` (ADU); ``locs``: ``[M, 2]`` known star positions
    (e.g. Hubble catalog projected onto the frame); ``fluxes_nmgy``:
    ``[M]`` known fluxes. Minimises the negative Gaussian log-likelihood
    of the reference ``M71ImageModel`` (images.py:159-175) with
    ``optax.lbfgs``; positivity is enforced with log-parameterisation.
    Parity: m71.ipynb cells 86-94.
    """
    image = jnp.asarray(image, dtype=jnp.float32)
    locs = jnp.asarray(locs, dtype=jnp.float32)
    fluxes = jnp.asarray(fluxes_nmgy, dtype=jnp.float32)
    H, W = image.shape

    init = {
        "log_psf": jnp.log(jnp.asarray(psf_params_init, dtype=jnp.float32)),
        "log_adu": jnp.log(jnp.asarray(adu_per_nmgy_init, dtype=jnp.float32)),
        "log_add": jnp.log(jnp.asarray(noise_additive_init, dtype=jnp.float32)),
        "log_mult": jnp.log(
            jnp.asarray(noise_multiplicative_init, dtype=jnp.float32)
        ),
        "log_bkg": jnp.log(jnp.asarray(background_init, dtype=jnp.float32)),
    }

    def build_model(p):
        bkg = (
            jnp.exp(p["log_bkg"])
            if fit_background
            else jnp.asarray(background_init, dtype=jnp.float32)
        )
        return M71ImageModel(
            image_height=H,
            image_width=W,
            background=bkg,
            adu_per_nmgy=jnp.exp(p["log_adu"]),
            psf_params=tuple(jnp.exp(p["log_psf"])),
            psf_radius=psf_radius,
            noise_additive=jnp.exp(p["log_add"]),
            noise_multiplicative=jnp.exp(p["log_mult"]),
        )

    def loss_fn(p):
        model = build_model(p)
        return -model.loglikelihood(image, locs, fluxes) / (H * W)

    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    @jax.jit
    def step(p, state):
        value, grad = value_and_grad(p, state=state)
        updates, state = opt.update(
            grad, state, p, value=value, grad=grad, value_fn=loss_fn
        )
        p = optax.apply_updates(p, updates)
        return p, state, value

    params = init
    state = opt.init(params)
    value = jnp.inf
    for _ in range(num_steps):
        params, state, value = step(params, state)
        if not bool(jnp.isfinite(value)):
            raise FloatingPointError("image-model fit diverged")

    model = build_model(params)
    return FittedImageModel(
        psf_params=tuple(float(v) for v in jnp.exp(params["log_psf"])),
        # scalar summary even when a background map was supplied
        background=float(jnp.mean(jnp.asarray(model.background))),
        adu_per_nmgy=float(jnp.exp(params["log_adu"])),
        noise_additive=float(jnp.exp(params["log_add"])),
        noise_multiplicative=float(jnp.exp(params["log_mult"])),
        final_loss=float(value),
    )
