"""Fused Pallas TPU kernel: the full single-component MH sweep loop.

The XLA path (inference/kernels.py) dispatches ~15 fused ops per sweep and
round-trips the per-particle rate cache (``[B, H*W]``) through HBM every
sweep. This kernel runs ALL ``num_iters`` sweeps of the mutation inside
one ``pallas_call``: particle state (locs, fluxes, rate image, cached
likelihood/prior) lives in VMEM for the whole loop, proposals come from
the on-core PRNG, and HBM is touched exactly once per mutate call instead
of once per sweep. The payoff grows with tile size — at the aggregation
tree's upper levels the rate cache is the dominant HBM traffic.

Layout notes (TPU):
- Two particle layouts share one kernel body via the ``_layout`` shape
  adapters. "classic": lane-major ``[rows, P]`` blocks (P=256 on the
  128-wide lane axis). "packed" (default for N a multiple of 1024):
  particle blocks of 8*128 tile the (sublane, lane) axes, so the
  per-update scalar math (uniform draws, truncated-normal
  sampling/masses, accept logic) runs on FULL (8, 128) vregs instead of
  1-sublane rows — measured 1.8x end-to-end (577 M vs 324 M updates/s
  on the full-frame north star, docs/PERF.md round 5). Per-pixel math
  is full-width in both.
- Slot selection uses one-hot masks (broadcasted iota) — no gathers.
- ``erf`` is not lowered by Mosaic, so Phi uses the Abramowitz-Stegun
  7.1.26 polynomial (~1.5e-7 abs error); ``erf_inv`` is native. The
  truncated-normal sampling transform and its log-density use the SAME
  Phi, so the proposal density matches the sampling distribution exactly
  and MH correctness is preserved (the target is untouched).

Supported targets: the tile-level tempered target
``logprior + tau * loglik`` AND the aggregation-bridge target
``logprior + tau * parent_ll + (1 - tau) * child_ll`` (the child term is
the parent render side-masked at the tile boundary — by the star's
current location, or by its fixed origin tag when the context carries
``child_slot_side``, exactly as in inference/aggregate.py), with either
image model (Gaussian noise or
Poisson-with-Normal-tail) and either PSF (SDSS 6-parameter or Gaussian) —
matching inference/kernels.py semantics for ``SingleComponentMH``
(reference smcdet/kernel.py:7-130) and ``SingleComponentMALA``
(kernel.py:133-275; analytic slot gradients, both targets).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_mh_sweeps", "pallas_mala_sweeps", "supports",
           "supports_mala"]

_SQRT2 = 1.4142135623730951
_HALF_LOG_2PI = 0.9189385332046727


def _erf_poly(x):
    """Abramowitz & Stegun 7.1.26 (max abs error ~1.5e-7)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _ndtr(z):
    return 0.5 * (1.0 + _erf_poly(z / _SQRT2))


def _ndtri(p):
    return _SQRT2 * jax.lax.erf_inv(2.0 * p - 1.0)


def _uniform(shape):
    """U(eps, 1-eps) from the on-core PRNG (matches distributions.py:62)."""
    bits = pltpu.prng_random_bits(shape)
    u = bits.astype(jnp.float32) * (2.0**-32) + 0.5
    return jnp.clip(u, 1e-6, 1.0 - 1e-6)


def _tn_sample_logq(u, mu, sigma, lb, ub):
    """Truncated-normal inverse-CDF sample + the box mass at ``mu``,
    sharing one Phi evaluation set (distributions.py:40-52)."""
    cdf_lb = _ndtr((lb - mu) / sigma)
    cdf_ub = _ndtr((ub - mu) / sigma)
    p = jnp.clip(cdf_lb + u * (cdf_ub - cdf_lb), 1e-6, 1.0 - 1e-6)
    x = jnp.clip(mu + sigma * _ndtri(p), lb, ub)
    return x, cdf_ub - cdf_lb


def _tn_log_mass(mu, sigma, lb, ub):
    mass = _ndtr((ub - mu) / sigma) - _ndtr((lb - mu) / sigma)
    return jnp.where(mass > 0, jnp.log(jnp.maximum(mass, 1e-37)), 0.0)


def _log_mass_from(mass):
    return jnp.where(mass > 0, jnp.log(jnp.maximum(mass, 1e-37)), 0.0)


def supports(ctx, kernel) -> bool:
    """True if the fused kernel covers this target configuration."""
    from smcdet_tpu.models.psf import GaussianPSF, SDSSPSF

    # Both bridge child modes are fused: the legacy location-based side
    # mask and the origin-tag mode (per-slot side input; the frozen ghost
    # rate needs no kernel support — it enters through the child_rate
    # cache at init and incremental updates preserve it).
    child_ok = ctx.child_model is None or (
        ctx.child_model is ctx.model
        and hasattr(ctx.child_side_mask, "axis")
        and hasattr(ctx.child_side_mask, "boundary")
    )
    return (
        child_ok
        and ctx.model.noise in ("gaussian", "poisson")
        and isinstance(ctx.model.psf, (GaussianPSF, SDSSPSF))
        and jax.devices()[0].platform == "tpu"
    )


def supports_mala(ctx, kernel) -> bool:
    """True if the fused MALA kernel covers this target configuration.

    Same model/PSF/bridge coverage as the MH kernel (delegates — the
    predicates are identical by construction): the bridge's child term
    contributes ``(1 - tau) * dll_child`` through the side-masked
    render, whose gradient is the parent render's gradient times the
    (piecewise-constant, hence gradient-transparent) side mask — exactly
    what ``jax.grad`` of the XLA slot target computes."""
    return supports(ctx, kernel)


def _layout(packed: bool, P: int):
    """Shape adapters for the two particle layouts.

    classic: particle block P rides the lane axis — scalars are
      ``[1, P]``, row arrays ``[rows, P]``. Every scalar op executes on
      (8, 128) vregs with ONE live sublane (1/8 utilization), and
      ``[M, P]`` slot ops at M/8 — measured ~3.6x effective-rate
      penalty vs full vregs (docs/PERF.md roofline, round 5).
    packed: particle block 8*128 tiles the (sublane, lane) axes —
      scalars are ``(8, 128)`` (one full vreg), row arrays
      ``[rows, 8, 128]``. Per-pixel math is unchanged (it was already
      full-width); the per-update scalar math (~340 flops + 24
      transcendentals: uniforms, truncated-normal sampling/masses,
      accept logic) runs at full sublane utilization.

    Returns ``(S, up, rsum)``: the scalar shape, the
    lift-scalar-to-row-broadcastable adapter, and the
    reduce-rows-to-scalar adapter.
    """
    if packed:
        S = (8, 128)

        def up(x):
            return x[None]

        def rsum(x):
            return x.sum(axis=0)

    else:
        S = (1, P)

        def up(x):
            return x

        def rsum(x):
            return x.sum(axis=0, keepdims=True)

    return S, up, rsum


def _make_kernel(H, W, M, P, num_iters, noise, psf_kind, flux_is_pareto,
                 flux_is_normal, child_axis=None, side_from_tag=False,
                 wing_beta3=False, packed=False):
    HW = H * W
    has_child = child_axis is not None
    S, up, rsum = _layout(packed, P)

    def kernel(*refs):
        # inputs: seed, params, temp, image, img_lgamma, counts, locs_y,
        # locs_x, fluxes, rate, pll, lp [, child_rate, cll]
        # outputs: locs_y, locs_x, fluxes, rate, pll, lp, acc
        # [, child_rate, cll]
        (
            seed_ref,
            params_ref,
            temp_ref,
            image_ref,
            img_lgamma_ref,
            counts_ref,
            locs_y_ref,
            locs_x_ref,
            fluxes_ref,
            rate_ref,
            pll_ref,
            lp_ref,
        ) = refs[:12]
        n_in = (14 if has_child else 12) + (1 if side_from_tag else 0)
        if has_child:
            child_rate_ref, cll_ref = refs[12:14]
        if side_from_tag:
            slot_side_ref = refs[14]  # [M, P] origin tags (1 = even child)
        (
            out_locs_y,
            out_locs_x,
            out_fluxes,
            out_rate,
            out_pll,
            out_lp,
            out_acc,
        ) = refs[n_in : n_in + 7]
        if has_child:
            out_child_rate, out_cll = refs[n_in + 7 : n_in + 9]
        t = pl.program_id(0)
        b = pl.program_id(1)
        # fold (seed, salt, tile, block) into one 32-bit stream id
        mixed = (
            seed_ref[0]
            + seed_ref[1] * jnp.int32(-1640531527)  # 0x9E3779B9
            + t * jnp.int32(-2048144789)  # 0x85EBCA6B
            + b * jnp.int32(-1028477387)  # 0xC2B2AE35
        )
        pltpu.prng_seed(mixed)

        pp = params_ref
        locs_stdev = pp[0]
        fluxes_stdev = pp[1]
        fluxes_min = pp[2]
        fluxes_max = pp[3]
        loc_low_y, loc_low_x = pp[4], pp[5]
        loc_high_y, loc_high_x = pp[6], pp[7]
        adu = pp[8]
        # pp[9] (background) is informational only: the background enters
        # through the pre-seeded rate caches (TargetContext.init_rates),
        # which also makes per-tile background maps transparent here.
        noise_add = pp[10]
        noise_mult = pp[11]
        psf_radius = pp[12]
        # psf params: gaussian -> pp[13]=stdev; sdss -> pp[13:19] + norm pp[19]
        normal_tail = pp[20]
        flux_a = pp[21]  # pareto alpha / normal mean
        flux_b = pp[22]  # pareto lognorm-const / normal stdev
        boundary = pp[23]  # aggregation-bridge tile boundary (child term)

        tau = temp_ref[t]

        image = image_ref[0]  # [HW, 1] / [HW, 1, 1]
        counts = counts_ref[0]  # S

        hh_i = jax.lax.broadcasted_iota(
            jnp.int32, (HW, 1, 1) if packed else (HW, 1), 0
        )
        h_pix = (hh_i // W).astype(jnp.float32) + 0.5  # [HW, 1(, 1)]
        w_pix = (hh_i % W).astype(jnp.float32) + 0.5
        m_iota = jax.lax.broadcasted_iota(
            jnp.int32, (M,) + (S if packed else S[1:]), 0
        )

        def psf_eval(r2):
            if psf_kind == "sdss":
                s1, s2, sp, beta, bb, p0 = (
                    pp[13], pp[14], pp[15], pp[16], pp[17], pp[18]
                )
                term1 = jnp.exp(-r2 / (2.0 * s1))
                term2 = bb * jnp.exp(-r2 / (2.0 * s2))
                if wing_beta3:
                    # beta = 3 (every repo config; SDSS pins it there):
                    # (1+x)^(-3/2) = rsqrt((1+x)^3) — saves an exp + log
                    # per pixel per render (models/psf.py wing_beta3)
                    qv = 1.0 + r2 / (beta * sp)
                    term3 = p0 * jax.lax.rsqrt(qv * qv * qv)
                else:
                    term3 = p0 * jnp.exp(
                        (-beta / 2.0) * jnp.log1p(r2 / (beta * sp))
                    )
                return (term1 + term2 + term3) / ((1.0 + bb + p0) * pp[19])
            stdev = pp[13]
            return jnp.exp(-0.5 * r2 / (stdev * stdev)) / (
                stdev * 2.5066282746310002
            )

        def star_image(ly, lx):
            # ly, lx: S -> [HW] + S
            uly, ulx = up(ly), up(lx)
            dy = h_pix - uly
            dx = w_pix - ulx
            in_h = jnp.abs(h_pix - 0.5 - jnp.floor(uly)) <= psf_radius
            in_w = jnp.abs(w_pix - 0.5 - jnp.floor(ulx)) <= psf_radius
            r2 = dy * dy + dx * dx
            return jnp.where(in_h & in_w, psf_eval(r2), 0.0)

        if has_child:
            # child tiles partition the parent pixels at `boundary` along
            # `child_axis`; a star's child render is its parent render
            # masked to its own side (inference/aggregate.py)
            pix_coord = (
                (hh_i // W) if child_axis == 0 else (hh_i % W)
            ).astype(jnp.float32) + 0.5  # [HW, 1(, 1)] pixel centre coord
            # f32 arithmetic select (bool broadcast-select of mixed shapes
            # hits a Mosaic truncation limitation)
            pix1 = (pix_coord < boundary).astype(jnp.float32)

            def side_mask(ly, lx):
                star_c = ly if child_axis == 0 else lx  # S
                star1 = up((star_c <= boundary).astype(jnp.float32))
                return pix1 * star1 + (1.0 - pix1) * (1.0 - star1)

            def side_mask_from(side1):
                # side1 S in {0., 1.}: the slot's ORIGIN child window
                # (fixed under mutation — the exact product-of-children
                # base measure, inference/aggregate.py)
                uside = up(side1)
                return pix1 * uside + (1.0 - pix1) * (1.0 - uside)

        def loglik(rate):
            if noise == "gaussian":
                var = noise_add + noise_mult * rate
                ll = (
                    -0.5 * (image - rate) ** 2 / var
                    - 0.5 * jnp.log(var)
                    - _HALF_LOG_2PI
                )
            else:
                # lgamma is not lowered by Mosaic, but it only touches the
                # (constant) image — precomputed outside the kernel.
                logpmf = (
                    image * jnp.log(rate)
                    - rate
                    - img_lgamma_ref[0]
                )
                z2 = (image - rate) ** 2 / rate
                lognorm = -0.5 * z2 - 0.5 * jnp.log(rate) - _HALF_LOG_2PI
                ll = jnp.where(rate > normal_tail, lognorm, logpmf)
            return rsum(ll)  # S

        def flux_log_prob(f):
            if flux_is_pareto:
                return flux_b - (flux_a + 1.0) * jnp.log(f)
            if flux_is_normal:
                z = (f - flux_a) / flux_b
                return -0.5 * z * z - jnp.log(flux_b) - _HALF_LOG_2PI
            return jnp.zeros_like(f)

        def body(i, carry):
            (locs_y, locs_x, fluxes, rate, pll, lp, acc,
             child_rate, cll) = carry

            # Select uniformly over the OCCUPIED slot prefix (slots
            # 0..count-1), not all M slots: the reference proposes over
            # every padded slot (kernel.py:35-44) so strata with s < M
            # objects waste (M-s)/M of their sweeps on no-op proposals —
            # ~50% averaged over counts 0..M. Occupied slots are
            # exchangeable, so uniform selection among them is symmetric
            # and the kernel stays exact for the same stratum target.
            u_j = _uniform(S)
            counts_f = counts.astype(jnp.float32)
            j = jnp.minimum(
                jnp.floor(u_j * counts_f).astype(jnp.int32),
                counts - 1,
            )  # S
            onehot = (m_iota == up(j)).astype(jnp.float32)  # [M] + S
            active = (counts > 0).astype(jnp.float32)  # S

            loc_jy = rsum(locs_y * onehot)  # S
            loc_jx = rsum(locs_x * onehot)
            f_j = rsum(fluxes * onehot)

            y_prop, mass_y = _tn_sample_logq(
                _uniform(S), loc_jy, locs_stdev, loc_low_y, loc_high_y
            )
            x_prop, mass_x = _tn_sample_logq(
                _uniform(S), loc_jx, locs_stdev, loc_low_x, loc_high_x
            )
            f_prop, mass_f = _tn_sample_logq(
                _uniform(S), f_j, fluxes_stdev, fluxes_min, fluxes_max
            )

            old_img = star_image(loc_jy, loc_jx)  # [HW] + S
            new_img = star_image(y_prop, x_prop)
            delta = adu * (up(f_prop) * new_img - up(f_j) * old_img)
            rate_prop = rate + up(active) * delta

            pll_prop = loglik(rate_prop)
            if has_child:
                if side_from_tag:
                    side_j = rsum(slot_side_ref[0] * onehot)  # S
                    w_old = w_new = side_mask_from(side_j)
                else:
                    w_old = side_mask(loc_jy, loc_jx)
                    w_new = side_mask(y_prop, x_prop)
                child_delta = adu * (
                    up(f_prop) * new_img * w_new - up(f_j) * old_img * w_old
                )
                child_rate_prop = child_rate + up(active) * child_delta
                cll_prop = loglik(child_rate_prop)
            else:
                child_rate_prop, cll_prop = child_rate, cll
            safe_old = jnp.where(active > 0, f_j, fluxes_min)
            safe_new = jnp.where(active > 0, f_prop, fluxes_min)
            lp_prop = lp + active * (
                flux_log_prob(safe_new) - flux_log_prob(safe_old)
            )

            # symmetric random walk: the Gaussian kernels cancel, only the
            # truncation-mass terms remain (masses at the OLD means come
            # free from sampling)
            log_q_rev_minus_fwd = (
                _log_mass_from(mass_y)
                - _tn_log_mass(y_prop, locs_stdev, loc_low_y, loc_high_y)
                + _log_mass_from(mass_x)
                - _tn_log_mass(x_prop, locs_stdev, loc_low_x, loc_high_x)
                + _log_mass_from(mass_f)
                - _tn_log_mass(f_prop, fluxes_stdev, fluxes_min, fluxes_max)
            )

            if has_child:
                # aggregation bridge: lp + tau*parent + (1-tau)*child
                log_alpha = (
                    (lp_prop + tau * pll_prop + (1.0 - tau) * cll_prop)
                    - (lp + tau * pll + (1.0 - tau) * cll)
                    + log_q_rev_minus_fwd
                )
            else:
                log_alpha = (
                    (lp_prop + tau * pll_prop)
                    - (lp + tau * pll)
                    + log_q_rev_minus_fwd
                )
            u_acc = _uniform(S)
            accept = (
                (u_acc <= jnp.exp(jnp.minimum(log_alpha, 0.0)))
                & (active > 0)
            ).astype(jnp.float32)  # S

            sel = onehot * up(accept)  # [M] + S
            locs_y = locs_y + sel * up(y_prop - loc_jy)
            locs_x = locs_x + sel * up(x_prop - loc_jx)
            fluxes = fluxes + sel * up(f_prop - f_j)
            rate = rate + up(accept) * (rate_prop - rate)
            pll = pll + accept * (pll_prop - pll)
            lp = lp + accept * (lp_prop - lp)
            if has_child:
                child_rate = child_rate + up(accept) * (
                    child_rate_prop - child_rate
                )
                cll = cll + accept * (cll_prop - cll)
            acc = acc + accept
            return (locs_y, locs_x, fluxes, rate, pll, lp, acc,
                    child_rate, cll)

        init = (
            locs_y_ref[0],
            locs_x_ref[0],
            fluxes_ref[0],
            rate_ref[0],
            pll_ref[0],
            lp_ref[0],
            jnp.zeros(S, jnp.float32),
            child_rate_ref[0] if has_child else jnp.zeros((1, 1)),
            cll_ref[0] if has_child else jnp.zeros((1, 1)),
        )
        (locs_y, locs_x, fluxes, rate, pll, lp, acc, child_rate, cll) = (
            jax.lax.fori_loop(0, num_iters, body, init)
        )
        out_locs_y[0] = locs_y
        out_locs_x[0] = locs_x
        out_fluxes[0] = fluxes
        out_rate[0] = rate
        out_pll[0] = pll
        out_lp[0] = lp
        out_acc[0] = acc
        if has_child:
            out_child_rate[0] = child_rate
            out_cll[0] = cll

    return kernel


def _make_mala_kernel(H, W, M, P, num_iters, noise, psf_kind,
                      flux_is_pareto, flux_is_normal, child_axis=None,
                      side_from_tag=False, wing_beta3=False, packed=False):
    """Fused single-component MALA sweep loop (tile and bridge targets).

    The slot target's gradient is closed-form — no autodiff inside the
    kernel (VERDICT r2 task 4): with ``rate = rate_wo + a*adu*f*psi(ly,lx)``,

      dG/df  = flux_lp'(f) + tau * sum_px dll/drate * a*adu*psi
      dG/dly = tau * sum_px dll/drate * a*adu*f * psi'(r2) * (-2*dy)
      dG/dlx = tau * sum_px dll/drate * a*adu*f * psi'(r2) * (-2*dx)

    (the patch mask and floor() have zero gradient, matching what
    ``jax.grad`` of the XLA path computes). The aggregation-bridge target
    adds ``(1 - tau) * child_ll`` whose rate is the side-masked render;
    the side mask (fixed origin tag, or the star's current tile in the
    legacy mode) is piecewise-constant in location, so the child term's
    gradient is the same expression with ``dll_child = dll(child_rate)``
    weighted ``(1 - tau)`` and the render derivatives masked — again
    exactly what ``jax.grad`` of the XLA slot target computes. Per sweep
    this costs two PSF+derivative evaluations and three extra HW
    reductions on top of the MH sweep's work — the measured basis for
    MALA landing within ~2-3x of MH instead of the XLA path's ~10x.
    """
    HW = H * W
    has_child = child_axis is not None
    S, up, rsum = _layout(packed, P)

    def kernel(*refs):
        (
            seed_ref,
            params_ref,
            temp_ref,
            image_ref,
            img_lgamma_ref,
            counts_ref,
            locs_y_ref,
            locs_x_ref,
            fluxes_ref,
            rate_ref,
            pll_ref,
            lp_ref,
        ) = refs[:12]
        n_in = (14 if has_child else 12) + (1 if side_from_tag else 0)
        if has_child:
            child_rate_ref, cll_ref = refs[12:14]
        if side_from_tag:
            slot_side_ref = refs[14]  # [M, P] origin tags (1 = even child)
        (
            out_locs_y,
            out_locs_x,
            out_fluxes,
            out_rate,
            out_pll,
            out_lp,
            out_acc,
        ) = refs[n_in : n_in + 7]
        if has_child:
            out_child_rate, out_cll = refs[n_in + 7 : n_in + 9]
        t = pl.program_id(0)
        b = pl.program_id(1)
        mixed = (
            seed_ref[0]
            + seed_ref[1] * jnp.int32(-1640531527)
            + t * jnp.int32(-2048144789)
            + b * jnp.int32(-1028477387)
        )
        pltpu.prng_seed(mixed)

        pp = params_ref
        locs_step = pp[0]
        fluxes_step = pp[1]
        fluxes_min = pp[2]
        fluxes_max = pp[3]
        loc_low_y, loc_low_x = pp[4], pp[5]
        loc_high_y, loc_high_x = pp[6], pp[7]
        adu = pp[8]
        noise_add = pp[10]
        noise_mult = pp[11]
        psf_radius = pp[12]
        normal_tail = pp[20]
        flux_a = pp[21]
        flux_b = pp[22]
        boundary = pp[23]  # aggregation-bridge tile boundary (child term)

        tau = temp_ref[t]
        image = image_ref[0]  # [HW, 1] / [HW, 1, 1]
        counts = counts_ref[0]  # S

        hh_i = jax.lax.broadcasted_iota(
            jnp.int32, (HW, 1, 1) if packed else (HW, 1), 0
        )
        h_pix = (hh_i // W).astype(jnp.float32) + 0.5
        w_pix = (hh_i % W).astype(jnp.float32) + 0.5
        m_iota = jax.lax.broadcasted_iota(
            jnp.int32, (M,) + (S if packed else S[1:]), 0
        )

        if has_child:
            # same side-mask construction as the fused MH kernel: child
            # tiles partition the parent pixels at `boundary` along
            # `child_axis`; f32 arithmetic select (a bool broadcast-select
            # of mixed shapes hits a Mosaic truncation limitation)
            pix_coord = (
                (hh_i // W) if child_axis == 0 else (hh_i % W)
            ).astype(jnp.float32) + 0.5  # [HW, 1(, 1)]
            pix1 = (pix_coord < boundary).astype(jnp.float32)

            def side_mask(ly, lx):
                star_c = ly if child_axis == 0 else lx  # S
                star1 = up((star_c <= boundary).astype(jnp.float32))
                return pix1 * star1 + (1.0 - pix1) * (1.0 - star1)

            def side_mask_from(side1):
                # side1 S in {0., 1.}: the slot's ORIGIN child window
                uside = up(side1)
                return pix1 * uside + (1.0 - pix1) * (1.0 - uside)

        def psf_and_deriv(ly, lx):
            """psi, dpsi/dr2, dy, dx ([HW] + S) for one star at S locs."""
            uly, ulx = up(ly), up(lx)
            dy = h_pix - uly
            dx = w_pix - ulx
            in_h = jnp.abs(h_pix - 0.5 - jnp.floor(uly)) <= psf_radius
            in_w = jnp.abs(w_pix - 0.5 - jnp.floor(ulx)) <= psf_radius
            mask = (in_h & in_w).astype(jnp.float32)
            r2 = dy * dy + dx * dx
            if psf_kind == "sdss":
                s1, s2, sp, beta, bb, p0 = (
                    pp[13], pp[14], pp[15], pp[16], pp[17], pp[18]
                )
                norm = (1.0 + bb + p0) * pp[19]
                t1 = jnp.exp(-r2 / (2.0 * s1))
                t2 = bb * jnp.exp(-r2 / (2.0 * s2))
                if wing_beta3:
                    # beta = 3: rsqrt((1+x)^3) (see the MH kernel); the
                    # dpsi wing term below is exponent-form-independent
                    qv = 1.0 + r2 / (beta * sp)
                    wing = jax.lax.rsqrt(qv * qv * qv)
                else:
                    wing = jnp.exp(
                        (-beta / 2.0) * jnp.log1p(r2 / (beta * sp))
                    )
                t3 = p0 * wing
                psi = (t1 + t2 + t3) / norm
                dpsi = (
                    t1 * (-1.0 / (2.0 * s1))
                    + t2 * (-1.0 / (2.0 * s2))
                    + t3 * (-0.5) / (sp + r2 / beta)
                ) / norm
            else:
                stdev = pp[13]
                psi = jnp.exp(-0.5 * r2 / (stdev * stdev)) / (
                    stdev * 2.5066282746310002
                )
                dpsi = psi * (-0.5 / (stdev * stdev))
            return psi * mask, dpsi * mask, dy, dx

        def loglik(rate):
            if noise == "gaussian":
                var = noise_add + noise_mult * rate
                ll = (
                    -0.5 * (image - rate) ** 2 / var
                    - 0.5 * jnp.log(var)
                    - _HALF_LOG_2PI
                )
            else:
                logpmf = (
                    image * jnp.log(rate) - rate - img_lgamma_ref[0]
                )
                z2 = (image - rate) ** 2 / rate
                lognorm = -0.5 * z2 - 0.5 * jnp.log(rate) - _HALF_LOG_2PI
                ll = jnp.where(rate > normal_tail, lognorm, logpmf)
            return rsum(ll)  # S

        def dll_drate(rate):
            """d loglik / d rate per pixel (same branch rules)."""
            if noise == "gaussian":
                var = noise_add + noise_mult * rate
                r = image - rate
                return (
                    r / var
                    + 0.5 * r * r * noise_mult / (var * var)
                    - 0.5 * noise_mult / var
                )
            d_pois = image / rate - 1.0
            r = image - rate
            d_norm = r / rate + 0.5 * r * r / (rate * rate) - 0.5 / rate
            return jnp.where(rate > normal_tail, d_norm, d_pois)

        def flux_log_prob(f):
            if flux_is_pareto:
                return flux_b - (flux_a + 1.0) * jnp.log(f)
            if flux_is_normal:
                z = (f - flux_a) / flux_b
                return -0.5 * z * z - jnp.log(flux_b) - _HALF_LOG_2PI
            return jnp.zeros_like(f)

        def flux_log_prob_grad(f):
            if flux_is_pareto:
                return -(flux_a + 1.0) / f
            if flux_is_normal:
                return -(f - flux_a) / (flux_b * flux_b)
            return jnp.zeros_like(f)

        def tn_log_q(x, mu, sigma, lb, ub):
            """log density of TruncatedNormal(mu, sigma, lb, ub) at x."""
            z = (x - mu) / sigma
            return (
                -0.5 * z * z
                - jnp.log(sigma)
                - _HALF_LOG_2PI
                - _tn_log_mass(mu, sigma, lb, ub)
            )

        half_ls2 = 0.5 * locs_step * locs_step
        half_fs2 = 0.5 * fluxes_step * fluxes_step

        def body(i, carry):
            (locs_y, locs_x, fluxes, rate, pll, lp, acc,
             child_rate, cll) = carry

            # uniform over the occupied slot prefix (see the MH kernel)
            u_j = _uniform(S)
            counts_f = counts.astype(jnp.float32)
            j = jnp.minimum(
                jnp.floor(u_j * counts_f).astype(jnp.int32), counts - 1
            )
            onehot = (m_iota == up(j)).astype(jnp.float32)  # [M] + S
            active = (counts > 0).astype(jnp.float32)  # S

            loc_jy = rsum(locs_y * onehot)
            loc_jx = rsum(locs_x * onehot)
            f_j = rsum(fluxes * onehot)
            f_safe = jnp.where(active > 0, f_j, fluxes_min)

            psi_o, dpsi_o, dy_o, dx_o = psf_and_deriv(loc_jy, loc_jx)
            aeff = active * adu  # S
            rate_wo = rate - up(aeff * f_j) * psi_o
            if has_child:
                if side_from_tag:
                    side_j = rsum(slot_side_ref[0] * onehot)  # S
                    w_o = side_mask_from(side_j)
                else:
                    w_o = side_mask(loc_jy, loc_jx)
                child_rate_wo = child_rate - up(aeff * f_j) * psi_o * w_o

            # forward drift at the current point (rate is the cached full
            # render; the slot's loglik-sum comes cached in pll). The
            # bridge child term contributes through its own rate cache
            # with weight (1 - tau) and the side-masked render.
            g_o = tau * dll_drate(rate)  # [HW] + S
            if has_child:
                gc_o = (1.0 - tau) * dll_drate(child_rate) * w_o
                g_loc_o = g_o + gc_o
            else:
                g_loc_o = g_o
            gly = rsum(g_loc_o * dpsi_o * (-2.0 * dy_o)) * (aeff * f_j)
            glx = rsum(g_loc_o * dpsi_o * (-2.0 * dx_o)) * (aeff * f_j)
            gf = rsum(g_loc_o * psi_o) * aeff + (
                active * flux_log_prob_grad(f_safe)
            )

            mu_y = loc_jy + half_ls2 * gly
            mu_x = loc_jx + half_ls2 * glx
            mu_f = f_safe + half_fs2 * gf
            y_prop, _ = _tn_sample_logq(
                _uniform(S), mu_y, locs_step, loc_low_y, loc_high_y
            )
            x_prop, _ = _tn_sample_logq(
                _uniform(S), mu_x, locs_step, loc_low_x, loc_high_x
            )
            f_prop, _ = _tn_sample_logq(
                _uniform(S), mu_f, fluxes_step, fluxes_min, fluxes_max
            )

            psi_n, dpsi_n, dy_n, dx_n = psf_and_deriv(y_prop, x_prop)
            rate_prop = rate_wo + up(aeff * f_prop) * psi_n
            pll_prop = loglik(rate_prop)
            if has_child:
                w_n = w_o if side_from_tag else side_mask(y_prop, x_prop)
                child_rate_prop = (
                    child_rate_wo + up(aeff * f_prop) * psi_n * w_n
                )
                cll_prop = loglik(child_rate_prop)
            else:
                child_rate_prop, cll_prop = child_rate, cll
            lp_prop = lp + active * (
                flux_log_prob(f_prop) - flux_log_prob(f_safe)
            )

            # reverse drift at the proposal
            g_n = tau * dll_drate(rate_prop)
            if has_child:
                gc_n = (1.0 - tau) * dll_drate(child_rate_prop) * w_n
                g_loc_n = g_n + gc_n
            else:
                g_loc_n = g_n
            gly_r = rsum(g_loc_n * dpsi_n * (-2.0 * dy_n)) * (aeff * f_prop)
            glx_r = rsum(g_loc_n * dpsi_n * (-2.0 * dx_n)) * (aeff * f_prop)
            gf_r = rsum(g_loc_n * psi_n) * aeff + (
                active * flux_log_prob_grad(f_prop)
            )
            mu_y_r = y_prop + half_ls2 * gly_r
            mu_x_r = x_prop + half_ls2 * glx_r
            mu_f_r = f_prop + half_fs2 * gf_r

            log_q_fwd = (
                tn_log_q(y_prop, mu_y, locs_step, loc_low_y, loc_high_y)
                + tn_log_q(x_prop, mu_x, locs_step, loc_low_x, loc_high_x)
                + tn_log_q(f_prop, mu_f, fluxes_step, fluxes_min, fluxes_max)
            )
            log_q_rev = (
                tn_log_q(loc_jy, mu_y_r, locs_step, loc_low_y, loc_high_y)
                + tn_log_q(loc_jx, mu_x_r, locs_step, loc_low_x, loc_high_x)
                + tn_log_q(
                    f_safe, mu_f_r, fluxes_step, fluxes_min, fluxes_max
                )
            )

            if has_child:
                log_alpha = (
                    (lp_prop + tau * pll_prop + (1.0 - tau) * cll_prop)
                    - (lp + tau * pll + (1.0 - tau) * cll)
                    + log_q_rev
                    - log_q_fwd
                )
            else:
                log_alpha = (
                    (lp_prop + tau * pll_prop)
                    - (lp + tau * pll)
                    + log_q_rev
                    - log_q_fwd
                )
            u_acc = _uniform(S)
            accept = (
                (u_acc <= jnp.exp(jnp.minimum(log_alpha, 0.0)))
                & (active > 0)
            ).astype(jnp.float32)

            sel = onehot * up(accept)
            locs_y = locs_y + sel * up(y_prop - loc_jy)
            locs_x = locs_x + sel * up(x_prop - loc_jx)
            fluxes = fluxes + sel * up(f_prop - f_j)
            rate = rate + up(accept) * (rate_prop - rate)
            pll = pll + accept * (pll_prop - pll)
            lp = lp + accept * (lp_prop - lp)
            if has_child:
                child_rate = child_rate + up(accept) * (
                    child_rate_prop - child_rate
                )
                cll = cll + accept * (cll_prop - cll)
            acc = acc + accept
            return (locs_y, locs_x, fluxes, rate, pll, lp, acc,
                    child_rate, cll)

        init = (
            locs_y_ref[0],
            locs_x_ref[0],
            fluxes_ref[0],
            rate_ref[0],
            pll_ref[0],
            lp_ref[0],
            jnp.zeros(S, jnp.float32),
            child_rate_ref[0] if has_child else jnp.zeros((1, 1)),
            cll_ref[0] if has_child else jnp.zeros((1, 1)),
        )
        (locs_y, locs_x, fluxes, rate, pll, lp, acc, child_rate, cll) = (
            jax.lax.fori_loop(0, num_iters, body, init)
        )
        out_locs_y[0] = locs_y
        out_locs_x[0] = locs_x
        out_fluxes[0] = fluxes
        out_rate[0] = rate
        out_pll[0] = pll
        out_lp[0] = lp
        out_acc[0] = acc
        if has_child:
            out_child_rate[0] = child_rate
            out_cll[0] = cll

    return kernel


@partial(
    jax.jit,
    static_argnames=("num_iters", "block", "noise", "psf_kind",
                     "flux_is_pareto", "flux_is_normal", "dims",
                     "child_axis", "side_from_tag", "variant",
                     "wing_beta3", "packed"),
)
def _run(seed, params, temperature, images, counts, locs, fluxes, rate,
         pll, lp, child_rate=None, cll=None, slot_side=None, *, num_iters,
         block, noise, psf_kind, flux_is_pareto, flux_is_normal, dims,
         child_axis=None, side_from_tag=False, variant="mh",
         wing_beta3=False, packed=False):
    T, CN, M, H, W = dims
    HW = H * W
    P = block
    nb = CN // P
    has_child = child_axis is not None

    if variant == "mala":
        kern = _make_mala_kernel(H, W, M, P, num_iters, noise, psf_kind,
                                 flux_is_pareto, flux_is_normal,
                                 child_axis=child_axis,
                                 side_from_tag=side_from_tag,
                                 wing_beta3=wing_beta3, packed=packed)
    else:
        kern = _make_kernel(H, W, M, P, num_iters, noise, psf_kind,
                            flux_is_pareto, flux_is_normal,
                            child_axis=child_axis,
                            side_from_tag=side_from_tag,
                            wing_beta3=wing_beta3, packed=packed)

    if packed:
        # (sublane, lane)-packed layout: particle p in a block maps to
        # (sub, lane) = (p // 128 % 8, p % 128); rows are the leading
        # (untiled) dim, so particle-scalar math runs on full (8, 128)
        # vregs (see _layout)
        def to_blocks(x, rows):
            # x: [T, CN, rows] -> [T*nb, rows, 8, 128]
            x = x.reshape(T, nb, 8, 128, rows).transpose(0, 1, 4, 2, 3)
            return x.reshape(T * nb, rows, 8, 128)

        def scalar_blocks(x):
            return x.reshape(T * nb, 8, 128)

        images_b = images.reshape(T, HW, 1, 1)
        scalar_spec = pl.BlockSpec(
            (1, 8, 128), lambda t, b: (t * nb + b, 0, 0),
            memory_space=pltpu.VMEM,
        )
        image_spec = pl.BlockSpec(
            (1, HW, 1, 1), lambda t, b: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

        def row_spec(rows):
            return pl.BlockSpec(
                (1, rows, 8, 128), lambda t, b: (t * nb + b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )

        def row_struct(rows):
            return jax.ShapeDtypeStruct(
                (T * nb, rows, 8, 128), jnp.float32
            )

        scalar_struct = jax.ShapeDtypeStruct((T * nb, 8, 128), jnp.float32)
    else:
        # lane-major layout: [T, CN, ...] -> [T*nb, rows, P]
        def to_blocks(x, rows):
            x = x.reshape(T, nb, P, rows).transpose(0, 1, 3, 2)
            return x.reshape(T * nb, rows, P)

        def scalar_blocks(x):
            return x.reshape(T * nb, 1, P)

        images_b = images.reshape(T, HW, 1)
        scalar_spec = pl.BlockSpec(
            (1, 1, P), lambda t, b: (t * nb + b, 0, 0),
            memory_space=pltpu.VMEM,
        )
        image_spec = pl.BlockSpec(
            (1, HW, 1), lambda t, b: (t, 0, 0),
            memory_space=pltpu.VMEM,
        )

        def row_spec(rows):
            return pl.BlockSpec(
                (1, rows, P), lambda t, b: (t * nb + b, 0, 0),
                memory_space=pltpu.VMEM,
            )

        def row_struct(rows):
            return jax.ShapeDtypeStruct((T * nb, rows, P), jnp.float32)

        scalar_struct = jax.ShapeDtypeStruct((T * nb, 1, P), jnp.float32)

    locs_y = to_blocks(locs[..., 0], M)
    locs_x = to_blocks(locs[..., 1], M)
    fluxes_b = to_blocks(fluxes, M)
    rate_b = to_blocks(rate.reshape(T, CN, HW), HW)
    counts_b = scalar_blocks(counts)
    pll_b = scalar_blocks(pll)
    lp_b = scalar_blocks(lp)
    if has_child:
        child_rate_b = to_blocks(child_rate.reshape(T, CN, HW), HW)
        cll_b = scalar_blocks(cll)
    if side_from_tag:
        slot_side_b = to_blocks(slot_side, M)

    grid = (T, nb)

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [2]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params [32]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # temperature [T]
            image_spec,  # image
            image_spec,  # lgamma(image+1)
            scalar_spec,  # counts
            row_spec(M),
            row_spec(M),
            row_spec(M),
            row_spec(HW),
            scalar_spec,  # pll
            scalar_spec,  # lp
        ]
        + ([row_spec(HW), scalar_spec] if has_child else [])
        + ([row_spec(M)] if side_from_tag else []),  # slot_side
        out_specs=[
            row_spec(M),
            row_spec(M),
            row_spec(M),
            row_spec(HW),
            scalar_spec,
            scalar_spec,
            scalar_spec,
        ]
        + ([row_spec(HW), scalar_spec] if has_child else []),
        out_shape=[
            row_struct(M),
            row_struct(M),
            row_struct(M),
            row_struct(HW),
            scalar_struct,
            scalar_struct,
            scalar_struct,
        ]
        + ([row_struct(HW), scalar_struct] if has_child else []),
    )(seed, params, temperature, images_b,
      jax.lax.lgamma(images_b + 1.0) if noise == "poisson"
      else jnp.zeros_like(images_b),
      counts_b, locs_y, locs_x, fluxes_b, rate_b, pll_b, lp_b,
      *((child_rate_b, cll_b) if has_child else ()),
      *((slot_side_b,) if side_from_tag else ()))

    o_ly, o_lx, o_f, o_rate, o_pll, o_lp, o_acc = out[:7]
    if has_child:
        o_child_rate, o_cll = out[7:9]

    if packed:
        def from_blocks(x, rows):
            x = x.reshape(T, nb, rows, 8, 128).transpose(0, 1, 3, 4, 2)
            return x.reshape(T, CN, rows)
    else:
        def from_blocks(x, rows):
            x = x.reshape(T, nb, rows, P).transpose(0, 1, 3, 2)
            return x.reshape(T, CN, rows)

    locs_out = jnp.stack(
        [from_blocks(o_ly, M), from_blocks(o_lx, M)], axis=-1
    )
    fluxes_out = from_blocks(o_f, M)
    rate_out = from_blocks(o_rate, HW)  # stays flat [T, CN, HW]
    pll_out = o_pll.reshape(T, CN)
    lp_out = o_lp.reshape(T, CN)
    acc_out = o_acc.reshape(T, CN) / num_iters
    if has_child:
        child_rate_out = from_blocks(o_child_rate, HW)
        cll_out = o_cll.reshape(T, CN)
        return (locs_out, fluxes_out, rate_out, pll_out, lp_out, acc_out,
                child_rate_out, cll_out)
    return (locs_out, fluxes_out, rate_out, pll_out, lp_out, acc_out,
            None, None)


def pallas_mh_sweeps(key, ctx, kernel, counts, locs, fluxes, rate,
                     parent_ll, logprior, child_rate=None, child_ll=None,
                     block: int = 256, variant: str = "mh",
                     layout: str | None = None):
    """Run ``kernel.num_iters`` fused MH sweeps; returns
    ``(locs, fluxes, rate, parent_ll, logprior, accept_frac)``.

    Inputs are the ``[*G, N]`` batched particle arrays of the XLA path;
    each leading-batch group G carries one (broadcastable) image and
    temperature. See module docstring for supported targets.

    ``layout`` selects the particle tiling (default: env
    ``SMCDET_PALLAS_LAYOUT`` or "auto"):
    - "packed": particle blocks of 1024 tile the (sublane, lane) axes —
      per-update scalar math runs on full (8, 128) vregs (~1.4x
      end-to-end, docs/PERF.md round-5 roofline); N is padded to a
      multiple of 1024 with inert particles.
    - "classic": 256-wide lane-major blocks (scalar rows at 1/8
      sublane utilization) — no padding waste below N=1024.
    - "auto": packed when N is already a multiple of 1024 (every
      production config), classic otherwise.
    """
    import os

    from smcdet_tpu.models.psf import SDSSPSF

    model = ctx.model
    prior = ctx.prior
    H, W = model.height, model.width
    batch = counts.shape
    if layout is None:
        layout = os.environ.get("SMCDET_PALLAS_LAYOUT", "auto")
    if layout not in ("auto", "packed", "classic"):
        # a typo'd env var silently running the ~1.8x-slower classic
        # layout would be invisible; fail loudly instead
        raise ValueError(
            f"SMCDET_PALLAS_LAYOUT/layout must be 'auto', 'packed' or "
            f"'classic', got {layout!r}"
        )
    if layout == "auto":
        packed = batch[-1] >= 1024 and batch[-1] % 1024 == 0
    else:
        packed = layout == "packed"
    if packed:
        block = 8 * 128
    # flatten every leading batch axis into the "tile" grid dimension; the
    # per-group image/temperature are broadcast up front (tiny arrays)
    T = int(np.prod(batch[:-1], dtype=int)) if len(batch) > 1 else 1
    CN = batch[-1]
    M = fluxes.shape[-1]
    img = jnp.asarray(ctx.image)
    while img.ndim < len(batch) + 2:
        img = img[None]
    # the particle axis must be broadcast (shared image per group): drop it
    img = img[..., 0, :, :]
    image_full = jnp.broadcast_to(img, batch[:-1] + (H, W)).reshape(T, H, W)
    tmp = jnp.asarray(ctx.temperature)
    while tmp.ndim < len(batch):
        tmp = tmp[None]
    temp_full = jnp.broadcast_to(tmp[..., 0], batch[:-1]).reshape(T)

    psf = model.psf
    is_sdss = isinstance(psf, SDSSPSF)
    params = jnp.zeros(32, dtype=jnp.float32)
    from smcdet_tpu.inference.kernels import _effective_flux_floor

    vals = {
        # MH carries stdevs, MALA carries step sizes in these two slots
        0: getattr(kernel, "locs_stdev", None)
        if variant == "mh"
        else kernel.locs_step,
        1: getattr(kernel, "fluxes_stdev", None)
        if variant == "mh"
        else kernel.fluxes_step,
        # clamped into the flux prior's support: the kernel uses this both
        # as the proposal truncation bound and as the masked-slot
        # placeholder flux, and a value outside support (default 0.0 with
        # a Pareto mark) makes flux_log_prob inf and poisons lp with NaN
        2: _effective_flux_floor(kernel.fluxes_min, prior),
        3: kernel.fluxes_max,
        4: prior.loc_low[0],
        5: prior.loc_low[1],
        6: prior.loc_high[0],
        7: prior.loc_high[1],
        8: model.adu_per_nmgy,
        # mean-scalarised: may be a per-tile map, unused by the kernel
        9: jnp.mean(jnp.asarray(model.background)),
        10: model.noise_additive,
        11: model.noise_multiplicative,
        12: float(model.psf_radius),
        20: float(model.normal_tail_threshold),
    }
    child_axis = None
    if ctx.child_model is not None:
        child_axis = int(ctx.child_side_mask.axis)
        vals[23] = float(ctx.child_side_mask.boundary)
    if is_sdss:
        vals.update({13: psf.sigma1, 14: psf.sigma2, 15: psf.sigmap,
                     16: psf.beta, 17: psf.b, 18: psf.p0,
                     19: psf.normalizing_constant})
    else:
        vals[13] = psf.stdev

    flux_is_pareto = flux_is_normal = False
    if prior.flux is not None:
        from smcdet_tpu.distributions import TruncatedPareto
        from smcdet_tpu.models.priors import NormalFlux, ParetoFlux

        if isinstance(prior.flux, TruncatedPareto):
            flux_is_pareto = True
            vals[21] = prior.flux.alpha
            vals[22] = prior.flux.logpdf_norm_const
        elif isinstance(prior.flux, ParetoFlux):
            flux_is_pareto = True
            vals[21] = prior.flux.alpha
            vals[22] = (
                jnp.log(prior.flux.alpha)
                + prior.flux.alpha * jnp.log(prior.flux.scale)
            )
        elif isinstance(prior.flux, NormalFlux):
            flux_is_normal = True
            vals[21] = prior.flux.mean
            vals[22] = prior.flux.stdev
        else:  # pragma: no cover
            raise NotImplementedError(type(prior.flux))
    for i, v in vals.items():
        params = params.at[i].set(jnp.asarray(v, dtype=jnp.float32))

    # pad CN to a multiple of block with inert particles (count 0)
    pad = (-CN) % block
    counts2 = counts.reshape(T, CN)
    locs2 = locs.reshape(T, CN, M, 2)
    fluxes2 = fluxes.reshape(T, CN, M)
    rate2 = rate.reshape(T, CN, H * W)
    pll2 = parent_ll.reshape(T, CN)
    lp2 = logprior.reshape(T, CN)
    crate2 = (
        child_rate.reshape(T, CN, H * W) if child_axis is not None else None
    )
    cll2 = child_ll.reshape(T, CN) if child_axis is not None else None
    slot_side = ctx.child_slot_side
    side_from_tag = child_axis is not None and slot_side is not None
    side2 = (
        jnp.asarray(slot_side, jnp.float32).reshape(T, CN, M)
        if side_from_tag
        else None
    )
    if pad:
        counts2 = jnp.pad(counts2, ((0, 0), (0, pad)))
        locs2 = jnp.pad(locs2, ((0, 0), (0, pad), (0, 0), (0, 0)))
        fluxes2 = jnp.pad(fluxes2, ((0, 0), (0, pad), (0, 0)))
        rate2 = jnp.pad(rate2, ((0, 0), (0, pad), (0, 0)),
                        constant_values=1.0)
        pll2 = jnp.pad(pll2, ((0, 0), (0, pad)))
        lp2 = jnp.pad(lp2, ((0, 0), (0, pad)))
        if child_axis is not None:
            crate2 = jnp.pad(crate2, ((0, 0), (0, pad), (0, 0)),
                             constant_values=1.0)
            cll2 = jnp.pad(cll2, ((0, 0), (0, pad)))
        if side_from_tag:
            side2 = jnp.pad(side2, ((0, 0), (0, pad), (0, 0)))

    temperature = temp_full.astype(jnp.float32)
    kdata = jax.random.key_data(key).astype(jnp.uint32)
    seed = jnp.asarray(
        [kdata.ravel()[0].astype(jnp.int32), kdata.ravel()[-1].astype(jnp.int32)],
        dtype=jnp.int32,
    )

    o = _run(
        seed, params, temperature, image_full,
        counts2, locs2, fluxes2, rate2, pll2, lp2, crate2, cll2, side2,
        num_iters=kernel.num_iters, block=block, noise=model.noise,
        psf_kind="sdss" if is_sdss else "gaussian",
        flux_is_pareto=flux_is_pareto, flux_is_normal=flux_is_normal,
        dims=(T, CN + pad, M, H, W), child_axis=child_axis,
        side_from_tag=side_from_tag, variant=variant,
        wing_beta3=is_sdss and getattr(psf, "wing_beta3", False),
        packed=packed,
    )
    locs_out, fluxes_out, rate_out, pll_out, lp_out, acc, crate_o, cll_o = o
    # strip padding, restore batch shape
    locs_out = locs_out[:, :CN].reshape(batch + (M, 2))
    fluxes_out = fluxes_out[:, :CN].reshape(batch + (M,))
    rate_out = rate_out[:, :CN].reshape(batch + (H * W,))
    pll_out = pll_out[:, :CN].reshape(batch)
    lp_out = lp_out[:, :CN].reshape(batch)
    acc = acc[:, :CN].reshape(batch)
    if child_axis is not None:
        crate_o = crate_o[:, :CN].reshape(batch + (H * W,))
        cll_o = cll_o[:, :CN].reshape(batch)
    return (locs_out, fluxes_out, rate_out, pll_out, lp_out, acc,
            crate_o, cll_o)


def pallas_mala_sweeps(key, ctx, kernel, counts, locs, fluxes, rate,
                       parent_ll, logprior, child_rate=None,
                       child_ll=None, block: int = 256,
                       layout: str | None = None):
    """Run ``kernel.num_iters`` fused MALA sweeps (tile or bridge target).

    Same input/output contract as ``pallas_mh_sweeps``; ``kernel`` is a
    ``SingleComponentMALA`` (its ``locs_step`` / ``fluxes_step`` ride in
    the proposal-scale slots).
    """
    return pallas_mh_sweeps(
        key, ctx, kernel, counts, locs, fluxes, rate, parent_ll, logprior,
        child_rate=child_rate, child_ll=child_ll, block=block,
        variant="mala", layout=layout,
    )
