"""Reverse-diffusion samplers: Predictor-Corrector, probability-flow ODE, and
Schroedinger-bridge samplers — each compiled as ONE jitted ``lax.scan`` over the
N reverse steps, with batched utterances.

Capability parity with /root/reference/sgmse/sampling/ (predictors.py,
correctors.py, __init__.py), re-designed TPU-first: the reference drives a
Python loop with 2N sequential device launches per utterance (batch=1) and, for
the ODE path, a host<->device round-trip per function evaluation
(sampling/__init__.py:57-65, 121-131). Here the whole trajectory traces into a
single XLA program: no Python in the hot loop, no host sync until the final
sample, and arbitrary utterance batching.

Predictor/corrector algorithms are pure step functions looked up from
registries (parity with PredictorRegistry/CorrectorRegistry,
predictors.py:9/correctors.py:8).

score_fn convention: ``score_fn(x, y, t) -> score`` with complex (B, C, F, T)
states and ``t`` of shape (B,).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .sdes import SDE, SBVESDE, crandn
from .utils.registry import Registry

PredictorRegistry = Registry("Predictor")
CorrectorRegistry = Registry("Corrector")


def _bcast(c):
    return c[:, None, None, None]


# ---------------------------------------------------------------------------------------
# Predictors (reference sampling/predictors.py:41-76)
# ---------------------------------------------------------------------------------------

@PredictorRegistry.register("reverse_diffusion")
def reverse_diffusion_predictor(sde: SDE, score_fn, probability_flow: bool = False):
    """x_mean = x - rev_f; x = x_mean + rev_G z (reference predictors.py:55-65)."""

    def update(x, y, t, stepsize, key, noise=None):
        score = score_fn(x, y, t)
        rev_f, rev_G = sde.reverse_discretize(score, x, y, t, stepsize,
                                              probability_flow=probability_flow)
        z = crandn(key, x.shape) if noise is None else noise
        x_mean = x - rev_f
        x_new = x_mean + _bcast(rev_G) * z
        return x_new, x_mean

    return update


@PredictorRegistry.register("euler_maruyama")
def euler_maruyama_predictor(sde: SDE, score_fn, probability_flow: bool = False):
    """Fixed dt = -1/N Euler-Maruyama step (reference predictors.py:41-52)."""

    def update(x, y, t, stepsize, key, noise=None):
        del stepsize
        dt = -1.0 / sde.N
        z = crandn(key, x.shape) if noise is None else noise
        score = score_fn(x, y, t)
        f, g = sde.reverse_sde(score, x, y, t, probability_flow=probability_flow)
        x_mean = x + f * dt
        x_new = x_mean + _bcast(g) * math.sqrt(-dt) * z
        return x_new, x_mean

    return update


@PredictorRegistry.register("none")
def none_predictor(sde: SDE, score_fn, probability_flow: bool = False):
    def update(x, y, t, stepsize, key, noise=None):
        return x, x

    return update


# ---------------------------------------------------------------------------------------
# Correctors (reference sampling/correctors.py:37-94)
# ---------------------------------------------------------------------------------------

@CorrectorRegistry.register("ald")
def ald_corrector(sde: SDE, score_fn, snr: float, n_steps: int):
    """Annealed Langevin dynamics: step = 2(snr*sigma(t))^2 (reference correctors.py:59-81)."""

    def update(x, y, t, key):
        std = sde.marginal_prob(x, y, t)[1]
        step_size = (snr * std) ** 2 * 2.0
        x_mean = x
        for i in range(n_steps):
            key, sub = jax.random.split(key)
            grad = score_fn(x, y, t)
            noise = crandn(sub, x.shape)
            x_mean = x + _bcast(step_size) * grad
            x = x_mean + noise * _bcast(jnp.sqrt(step_size * 2.0))
        return x, x_mean

    return update


@CorrectorRegistry.register("langevin")
def langevin_corrector(sde: SDE, score_fn, snr: float, n_steps: int):
    """Step size from grad/noise norm ratio (reference correctors.py:37-56)."""

    def update(x, y, t, key):
        x_mean = x
        for i in range(n_steps):
            key, sub = jax.random.split(key)
            grad = score_fn(x, y, t)
            noise = crandn(sub, x.shape)
            b = grad.shape[0]
            grad_norm = jnp.mean(jnp.linalg.norm(grad.reshape(b, -1), axis=-1))
            noise_norm = jnp.mean(jnp.linalg.norm(noise.reshape(b, -1), axis=-1))
            step_size = ((snr * noise_norm / grad_norm) ** 2 * 2.0)[None]
            x_mean = x + _bcast(step_size) * grad
            x = x_mean + noise * jnp.sqrt(step_size * 2.0)[:, None, None, None]
        return x, x_mean

    return update


@CorrectorRegistry.register("none")
def none_corrector(sde: SDE, score_fn, snr: float, n_steps: int):
    def update(x, y, t, key):
        return x, x

    return update


# ---------------------------------------------------------------------------------------
# Predictor-Corrector sampler: one lax.scan over N steps
# ---------------------------------------------------------------------------------------

def pc_sampler_program(
    predictor_name: str,
    corrector_name: str,
    sde: SDE,
    score_fn: Callable,
    denoise: bool = True,
    eps: float = 3e-2,
    snr: float = 0.1,
    corrector_steps: int = 1,
    probability_flow: bool = False,
    intermediate: bool = False,
    unroll: int = 1,
    inject_prior: bool = False,
    inject_steps: bool = False,
) -> Tuple[Callable, int]:
    """Build the jitted PC program ``sampler(key, y) -> sample`` plus its NFE.

    With ``inject_prior=True`` the program signature becomes
    ``sampler(key, y, z)`` where ``z`` has y's shape and the prior sample is
    formed deterministically as ``sde.prior_from_noise(z, y)``. With
    ``inject_steps=True`` additionally (requires corrector 'none'), ``z`` has
    shape ``(N+1, *y.shape)``: ``z[0]`` is the prior draw and ``z[1+i]`` the
    predictor noise of step i. These are the hooks used to drive this
    sampler and the torch reference from the *same* noise sequence for
    end-to-end pipeline-parity verification (tests/test_pipeline_parity.py).

    With ``intermediate=True`` the program returns ``(sample, trajectory)``
    where trajectory has shape ``(N, *sample.shape)`` — the state after each
    of the N predictor steps (final entry == the pre-denoise sample). The
    reference accepts this flag but ignores it (sampling/__init__.py:28);
    here it is implemented via the scan's per-step outputs.

    Separate from :func:`get_pc_sampler` so callers (ScoreModel) can CACHE the
    jitted program and rebind it to new inputs of the same shape — a fresh
    closure per call would force a retrace (and on backends without a
    populated compile cache, a full recompile) for every utterance batch.
    """
    predictor = PredictorRegistry.get_by_name(predictor_name)(
        sde, score_fn, probability_flow=probability_flow)
    corrector = CorrectorRegistry.get_by_name(corrector_name)(
        sde, score_fn, snr=snr, n_steps=corrector_steps)
    actual_corrector_steps = 0 if corrector_name == "none" else corrector_steps

    n = sde.N
    timesteps = jnp.linspace(sde.T, eps, n)
    # Non-uniform last step: eps -> 0 (reference sampling/__init__.py:59-62).
    stepsizes = jnp.concatenate([timesteps[:-1] - timesteps[1:], timesteps[-1:]])

    if inject_steps and corrector_name != "none":
        raise ValueError("inject_steps verification requires corrector='none' "
                         "(corrector noise is not injectable)")

    @jax.jit
    def sampler(key, y, z=None):
        key, kprior = jax.random.split(key)
        if inject_steps:
            xt = sde.prior_from_noise(z[0], y)
        elif inject_prior:
            xt = sde.prior_from_noise(z, y)
        else:
            xt = sde.prior_sampling(kprior, y)
        batch = y.shape[0]

        def step(carry, inp):
            x, k = carry
            if inject_steps:
                t, dt, zp = inp
            else:
                t, dt = inp
                zp = None
            vec_t = jnp.ones((batch,), dtype=jnp.float32) * t
            k, kc, kp = jax.random.split(k, 3)
            x, _ = corrector(x, y, vec_t, kc)
            x, _ = predictor(x, y, vec_t, dt, kp, noise=zp)
            return (x, k), (x if intermediate else None)

        xs = ((timesteps[:-1], stepsizes[:-1], z[1:n])
              if inject_steps else (timesteps[:-1], stepsizes[:-1]))
        # Keep the carried key: re-splitting the pre-scan key here would
        # reuse the first scan step's noise keys bit-for-bit.
        (xt, key), traj = jax.lax.scan(step, (xt, key), xs, unroll=unroll)

        # Final step separately so we can keep x_mean for denoising.
        vec_t = jnp.ones((batch,), dtype=jnp.float32) * timesteps[-1]
        key, kc, kp = jax.random.split(key, 3)
        xt, xt_mean = corrector(xt, y, vec_t, kc)
        xt, xt_mean = predictor(xt, y, vec_t, stepsizes[-1], kp,
                                noise=z[n] if inject_steps else None)
        result = xt_mean if denoise else xt
        if intermediate:
            return result, jnp.concatenate([traj, xt[None]], axis=0)
        return result

    nfe = n * (actual_corrector_steps + 1)
    return sampler, nfe


def get_pc_sampler(
    predictor_name: str,
    corrector_name: str,
    sde: SDE,
    score_fn: Callable,
    y: jnp.ndarray,
    denoise: bool = True,
    eps: float = 3e-2,
    snr: float = 0.1,
    corrector_steps: int = 1,
    probability_flow: bool = False,
    intermediate: bool = False,
    **ignored_kwargs,
):
    """Predictor-Corrector sampler factory (API parity: sampling/__init__.py:26-70).

    Returns ``sampler(key) -> (sample, nfe)``. The whole N-step trajectory is a
    single jitted lax.scan; `nfe` is the static NFE count N*(corrector_steps+1)
    for non-'none' correctors (reference line 67). With ``intermediate=True``
    returns ``((sample, trajectory), nfe)`` — see :func:`pc_sampler_program`.
    """
    sampler, nfe = pc_sampler_program(
        predictor_name, corrector_name, sde, score_fn, denoise=denoise, eps=eps,
        snr=snr, corrector_steps=corrector_steps, probability_flow=probability_flow,
        intermediate=intermediate)

    def sample(key):
        return sampler(key, y), nfe

    return sample


# ---------------------------------------------------------------------------------------
# Probability-flow ODE sampler
# ---------------------------------------------------------------------------------------

# Dormand-Prince 5(4) tableau (the method behind scipy's RK45).
_DP_C = (0.0, 1.0 / 5, 3.0 / 10, 4.0 / 5, 8.0 / 9, 1.0)
_DP_A = (
    (),
    (1.0 / 5,),
    (3.0 / 40, 9.0 / 40),
    (44.0 / 45, -56.0 / 15, 32.0 / 9),
    (19372.0 / 6561, -25360.0 / 2187, 64448.0 / 6561, -212.0 / 729),
    (9017.0 / 3168, -355.0 / 33, 46732.0 / 5247, 49.0 / 176, -5103.0 / 18656),
)
_DP_B5 = (35.0 / 384, 0.0, 500.0 / 1113, 125.0 / 192, -2187.0 / 6784, 11.0 / 84, 0.0)
_DP_B4 = (5179.0 / 57600, 0.0, 7571.0 / 16695, 393.0 / 640, -92097.0 / 339200,
          187.0 / 2100, 1.0 / 40)


def ode_sampler_program(
    sde: SDE,
    score_fn: Callable,
    denoise: bool = True,
    eps: float = 3e-2,
    N: Optional[int] = None,
    method: str = "rk45",
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 1000,
    inject_prior: bool = False,
):
    """Probability-flow ODE sampler, fully on device.

    With ``inject_prior=True`` the program signature becomes
    ``sampler(key, y, z)`` and the prior sample is formed deterministically as
    ``sde.prior_from_noise(z, y)`` — the hook used to start this solver and
    the reference's scipy RK45 from the SAME x_T for tolerance-level
    terminal-state comparison (tests/test_reference_anchor.py).

    Parity with the reference's ODE path (sampling/__init__.py:73-143), which
    drives scipy's adaptive RK45 (rtol=atol=1e-5) from the host with two
    host<->device round-trips per function evaluation. Here:

    - ``method='rk45'`` (default, matching the reference): adaptive
      Dormand-Prince 5(4) with FSAL and a standard step controller, as ONE
      jitted ``lax.while_loop`` — zero host round-trips. Like scipy on the
      flattened batch, the step size adapts on the global error norm.
      Returns the actual (data-dependent) NFE.
    - ``method='rk4'``: fixed-step classic RK4 over N uniform steps in a
      ``lax.scan`` (N defaults to ``sde.N``); NFE = 4N (+1 denoise).

    Both end with one denoising reverse-diffusion half-step at t=eps when
    ``denoise`` (reference lines 99-102).
    """
    n = N if N is not None else sde.N

    def drift_fn(x, t_scalar, y):
        vec_t = jnp.ones((y.shape[0],), dtype=jnp.float32) * t_scalar
        score = score_fn(x, y, vec_t)
        drift, _ = sde.reverse_sde(score, x, y, vec_t, probability_flow=True)
        return drift

    def denoise_step(x, y):
        vec_eps = jnp.ones((y.shape[0],), dtype=jnp.float32) * eps
        score = score_fn(x, y, vec_eps)
        rev_f, _ = sde.reverse_discretize(score, x, y, vec_eps, vec_eps[0],
                                          probability_flow=False)
        return x - rev_f

    def _rms(v):
        # scipy's rms_norm: ||v||_2 / sqrt(size) = sqrt(mean |v|^2).
        a = jnp.abs(v)
        return jnp.sqrt(jnp.mean(a * a))

    def _err_norm(e, x0, x1):
        scale = atol + rtol * jnp.maximum(jnp.abs(x0), jnp.abs(x1))
        return _rms(jnp.abs(e) / scale)

    def _select_initial_step(x0, t0, f0, y):
        """scipy.integrate._ivp.common.select_initial_step, direction=-1,
        error-estimator order 4 (exponent 1/5). Costs ONE extra function
        evaluation (the Euler trial), exactly like scipy. Matching scipy's
        h0 pins our NFE to the reference's scipy-RK45 NFE
        (tests/test_reference_anchor.py asserts the ratio is <= 1.3)."""
        scale = atol + jnp.abs(x0) * rtol
        d0 = _rms(x0 / scale)
        d1 = _rms(f0 / scale)
        h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
        x1 = x0 - h0 * f0  # direction = -1 (reverse time)
        f1 = drift_fn(x1, t0 - h0, y)
        d2 = _rms((f1 - f0) / scale) / h0
        dm = jnp.maximum(d1, d2)
        h1 = jnp.where(dm <= 1e-15,
                       jnp.maximum(1e-6, h0 * 1e-3),
                       (0.01 / dm) ** 0.2)
        return jnp.minimum(100.0 * h0, h1)

    @jax.jit
    def rk45_sampler(key, y, z=None):
        x0 = sde.prior_from_noise(z, y) if inject_prior \
            else sde.prior_sampling(key, y)
        t0 = jnp.float32(sde.T)
        k1_0 = drift_fn(x0, t0, y)
        h0 = -_select_initial_step(x0, t0, k1_0, y)  # negative: reverse time

        def cond(carry):
            x, t, h, k1, rejected, nfe, steps = carry
            return (t > eps + 1e-8) & (steps < max_steps)

        def body(carry):
            x, t, h, k1, rejected, nfe, steps = carry
            # Do not step past t=eps.
            h = jnp.maximum(h, eps - t)
            ks = [k1]
            for i in range(1, 6):
                xi = x
                for j, aij in enumerate(_DP_A[i]):
                    xi = xi + h * aij * ks[j]
                ks.append(drift_fn(xi, t + _DP_C[i] * h, y))
            x5 = x
            for bi, ki in zip(_DP_B5[:6], ks):
                x5 = x5 + h * bi * ki
            k7 = drift_fn(x5, t + h, y)  # FSAL
            ks.append(k7)
            err = jnp.zeros_like(x)
            for b5, b4, ki in zip(_DP_B5, _DP_B4, ks):
                err = err + h * (b5 - b4) * ki
            enorm = _err_norm(err, x, x5)
            accept = enorm <= 1.0
            # scipy's controller: SAFETY=0.9, MIN_FACTOR=0.2, MAX_FACTOR=10,
            # exponent -1/5; zero error grows by MAX_FACTOR; an acceptance
            # immediately after a rejection must not grow the step.
            factor = jnp.where(enorm == 0.0, 10.0,
                               jnp.clip(0.9 * enorm ** -0.2, 0.2, 10.0))
            factor = jnp.where(accept & rejected,
                               jnp.minimum(factor, 1.0), factor)
            h_next = h * factor  # both h<0: factor scales magnitude
            x = jnp.where(accept, x5, x)
            t = jnp.where(accept, t + h, t)
            k1 = jnp.where(accept, k7, k1)
            return (x, t, h_next, k1, ~accept, nfe + 6, steps + 1)

        x, t, h, k1, rejected, nfe, steps = jax.lax.while_loop(
            cond, body, (x0, t0, h0, k1_0, jnp.bool_(False),
                         jnp.int32(2), jnp.int32(0)))
        if denoise:
            x = denoise_step(x, y)
            nfe = nfe + 1
        return x, nfe, t

    ts = jnp.linspace(sde.T, eps, n + 1)

    @jax.jit
    def rk4_sampler(key, y, z=None):
        x0 = sde.prior_from_noise(z, y) if inject_prior \
            else sde.prior_sampling(key, y)

        def rk4_step(x, i):
            t0, t1 = ts[i], ts[i + 1]
            h = t1 - t0  # negative (reverse time)
            k1 = drift_fn(x, t0, y)
            k2 = drift_fn(x + 0.5 * h * k1, t0 + 0.5 * h, y)
            k3 = drift_fn(x + 0.5 * h * k2, t0 + 0.5 * h, y)
            k4 = drift_fn(x + h * k3, t1, y)
            return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

        x, _ = jax.lax.scan(rk4_step, x0, jnp.arange(n))
        if denoise:
            x = denoise_step(x, y)
        return x

    if method == "rk45":
        def program(key, y, z=None):
            x, nfe, t_final = (rk45_sampler(key, y, z) if inject_prior
                               else rk45_sampler(key, y))
            # The while_loop is bounded by max_steps; if it ran out before
            # reaching t=eps (e.g. a too-tight rtol on a long utterance) the
            # returned state is only partially integrated — surface it loudly
            # instead of returning silently wrong audio. t_final is already on
            # host-bound path (int(nfe) forces readback), so this is free.
            if float(t_final) > eps + 1e-6:
                import warnings
                warnings.warn(
                    f"ODE sampler hit max_steps={max_steps} at t={float(t_final):.4f} "
                    f"before reaching t_eps={eps}; result is partially integrated. "
                    "Raise max_steps or loosen rtol/atol.")
            return x, int(nfe)
        return program
    elif method == "rk4":
        nfe_static = 4 * n + (1 if denoise else 0)

        def program(key, y, z=None):
            x = rk4_sampler(key, y, z) if inject_prior else rk4_sampler(key, y)
            return x, nfe_static
        return program
    raise ValueError(f"Unknown ODE method: {method}")


def get_ode_sampler(
    sde: SDE,
    score_fn: Callable,
    y: jnp.ndarray,
    denoise: bool = True,
    eps: float = 3e-2,
    N: Optional[int] = None,
    method: str = "rk45",
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 1000,
    **ignored_kwargs,
):
    """Probability-flow ODE sampler factory: ``sampler(key) -> (sample, nfe)``.

    See :func:`ode_sampler_program` for the method semantics; this binds `y`.
    """
    program = ode_sampler_program(sde, score_fn, denoise=denoise, eps=eps, N=N,
                                  method=method, rtol=rtol, atol=atol,
                                  max_steps=max_steps)

    def sample(key):
        return program(key, y)

    return sample


# ---------------------------------------------------------------------------------------
# Schroedinger-bridge samplers (reference sampling/__init__.py:145-249)
# ---------------------------------------------------------------------------------------

def sb_sampler_program(
    sde: SBVESDE,
    model_fn: Callable,
    eps: float = 1e-4,
    sampler_type: str = "ode",
    inject_steps: bool = False,
) -> Tuple[Callable, int]:
    """Build the jitted SB program ``sampler(key, y) -> sample`` plus its NFE.

    ``model_fn(x, y, t)`` is called in data-prediction mode (returns x_hat).
    ``xt`` starts at ``y`` exactly (reference lines 150, 198). Cacheable by
    callers; `y` is a runtime argument (see :func:`pc_sampler_program`).

    With ``inject_steps=True`` (sde variant only) the program signature
    becomes ``sampler(key, y, z)`` with ``z`` of shape ``(N, B, 1, F, T)`` —
    the per-step noise draws, replacing the on-device RNG. This is the hook
    used to drive this sampler and the torch reference's get_sb_sampler
    (sampling/__init__.py:147-193) from the SAME noise sequence for
    end-to-end parity verification (tests/test_reference_anchor.py).
    """
    n = sde.N
    time_steps = jnp.linspace(sde.T, eps, n + 1)

    def tables(t_scalar, batch):
        vec = jnp.ones((batch,), dtype=jnp.float32) * t_scalar
        return vec, sde.sigmas_alphas(vec)

    @jax.jit
    def sde_sampler(key, y, z=None):
        xt = y[:, :1, :, :]  # special case for multi-channel inputs (reference line 150)
        _, (sigma_prev, sigma_T, sigma_bar_prev, alpha_prev, alpha_T, alpha_bar_prev) = \
            tables(time_steps[0], y.shape[0])

        def step(carry, inp):
            xt, alpha_prev, sigma_prev, sigma_bar_prev, k = carry
            if inject_steps:
                t, is_last, zp = inp
            else:
                t, is_last = inp
            vec_t = jnp.ones((y.shape[0],), dtype=jnp.float32) * t
            sigma_t, sigma_T, sigma_bart, alpha_t, alpha_T, alpha_bart = \
                sde.sigmas_alphas(vec_t)
            est = model_fn(xt, y, vec_t)
            weight_prev = alpha_t * sigma_t**2 / (alpha_prev * sigma_prev**2 + sde.eps)
            tmp = 1.0 - sigma_t**2 / (sigma_prev**2 + sde.eps)
            weight_estimate = alpha_t * tmp
            weight_z = alpha_t * sigma_t * jnp.sqrt(tmp)
            weight_z = jnp.where(is_last, 0.0, weight_z)
            k, sub = jax.random.split(k)
            znoise = zp if inject_steps else crandn(sub, xt.shape)
            xt = (_bcast(weight_prev) * xt + _bcast(weight_estimate) * est
                  + _bcast(weight_z) * znoise)
            return (xt, alpha_t, sigma_t, sigma_bart, k), None

        is_last = jnp.arange(1, n + 1) == n
        xs = ((time_steps[1:], is_last, z) if inject_steps
              else (time_steps[1:], is_last))
        (xt, *_), _ = jax.lax.scan(
            step, (xt, alpha_prev, sigma_prev, sigma_bar_prev, key), xs)
        return xt

    @jax.jit
    def ode_sampler(key, y):
        del key
        xt = y
        _, (sigma_prev, sigma_T, sigma_bar_prev, alpha_prev, alpha_T, alpha_bar_prev) = \
            tables(time_steps[0], y.shape[0])

        def step(carry, t):
            xt, alpha_prev, sigma_prev, sigma_bar_prev = carry
            vec_t = jnp.ones((y.shape[0],), dtype=jnp.float32) * t
            sigma_t, sigma_T, sigma_bart, alpha_t, alpha_T, alpha_bart = \
                sde.sigmas_alphas(vec_t)
            est = model_fn(xt, y, vec_t)
            weight_prev = (alpha_t * sigma_t * sigma_bart
                           / (alpha_prev * sigma_prev * sigma_bar_prev + sde.eps))
            weight_estimate = (alpha_t / (sigma_T**2 + sde.eps)
                               * (sigma_bart**2
                                  - sigma_bar_prev * sigma_t * sigma_bart
                                  / (sigma_prev + sde.eps)))
            weight_prior_mean = (alpha_t / (alpha_T * sigma_T**2 + sde.eps)
                                 * (sigma_t**2
                                    - sigma_prev * sigma_t * sigma_bart
                                    / (sigma_bar_prev + sde.eps)))
            xt = (_bcast(weight_prev) * xt + _bcast(weight_estimate) * est
                  + _bcast(weight_prior_mean) * y)
            return (xt, alpha_t, sigma_t, sigma_bart), None

        (xt, *_), _ = jax.lax.scan(
            step, (xt, alpha_prev, sigma_prev, sigma_bar_prev), time_steps[1:])
        return xt

    if sampler_type == "sde":
        return sde_sampler, n
    elif sampler_type == "ode":
        if inject_steps:
            raise ValueError("inject_steps only applies to the (stochastic) "
                             "sde variant; the ode variant is noise-free")
        return ode_sampler, n
    raise ValueError("Invalid type. Choose 'ode' or 'sde'.")


def get_sb_sampler(
    sde: SBVESDE,
    model_fn: Callable,
    y: jnp.ndarray,
    eps: float = 1e-4,
    sampler_type: str = "ode",
    **ignored_kwargs,
):
    """First-order SB sampler factory: ``sampler(key) -> (sample, nfe)``."""
    program, nfe = sb_sampler_program(sde, model_fn, eps=eps,
                                      sampler_type=sampler_type)

    def sample(key):
        return program(key, y), nfe

    return sample
