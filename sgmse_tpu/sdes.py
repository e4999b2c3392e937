"""Diffusion-process (SDE) layer: OUVE and SBVE as pure-functional dataclasses.

Capability parity with /root/reference/sgmse/sdes.py, re-designed TPU-first:
instead of runtime-synthesized reverse-SDE classes (reference sdes.py:91-137),
the reverse drift/diffusion are pure functions of ``(score, x, y, t)`` that
trace cleanly under ``jit``/``lax.scan``. All coefficients are closed-form jnp
expressions; no host math in the hot loop.

Conventions:
- ``t`` has shape ``(B,)``; state tensors ``x``/``y`` have shape ``(B, C, F, T)``
  (complex64). Coefficient broadcast appends three singleton axes, matching the
  reference's ``[:, None, None, None]`` convention.
- The forward SDE is ``dx = f(x, y, t) dt + g(t) dw``.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from .utils.registry import Registry

SDERegistry = Registry("SDE")


def _bcast(coeff: jnp.ndarray) -> jnp.ndarray:
    """(B,) -> (B, 1, 1, 1) for broadcasting against (B, C, F, T) states."""
    return coeff[:, None, None, None]


@dataclasses.dataclass(frozen=True)
class SDE:
    """Base SDE. Subclasses implement ``sde``, ``marginal_prob``, ``prior_sampling``.

    Frozen dataclass => hashable, usable as a jit static argument.
    """

    N: int = 30

    @property
    def T(self) -> float:
        return 1.0

    # --- forward process ------------------------------------------------------------------
    def sde(self, x, y, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError

    def marginal_prob(self, x0, y, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError

    def prior_sampling(self, key, y) -> jnp.ndarray:
        raise NotImplementedError

    def prior_from_noise(self, z, y) -> jnp.ndarray:
        """Deterministic form of :meth:`prior_sampling` given the standard
        complex normal draw ``z`` explicitly. Used for cross-framework
        verification (inject the same z into this and the torch reference)
        and for reproducible sampling with externally managed noise."""
        raise NotImplementedError

    def _std(self, t) -> jnp.ndarray:
        raise NotImplementedError

    # --- discretizations (reference sdes.py:72-89) ----------------------------------------
    def discretize(self, x, y, t, stepsize) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Euler-Maruyama discretization: x_{i+1} = x_i + f_i + G_i z_i. Returns (f, G)."""
        drift, diffusion = self.sde(x, y, t)
        return drift * stepsize, diffusion * jnp.sqrt(stepsize)

    # --- reverse process as pure functions (replaces reference's RSDE class) --------------
    def reverse_sde(self, score, x, y, t, probability_flow: bool = False):
        """Drift and diffusion of the reverse-time SDE/ODE given the score value.

        Reference semantics: sdes.py:113-128.
        """
        drift, diffusion = self.sde(x, y, t)
        factor = 0.5 if probability_flow else 1.0
        score_drift = -_bcast(diffusion**2) * score * factor
        rev_diffusion = jnp.zeros_like(diffusion) if probability_flow else diffusion
        return drift + score_drift, rev_diffusion

    def reverse_discretize(self, score, x, y, t, stepsize, probability_flow: bool = False):
        """Discretized reverse iteration (reference sdes.py:130-135). Returns (rev_f, rev_G)."""
        f, G = self.discretize(x, y, t, stepsize)
        factor = 0.5 if probability_flow else 1.0
        rev_f = f - _bcast(G**2) * score * factor
        rev_G = jnp.zeros_like(G) if probability_flow else G
        return rev_f, rev_G

    # --- CLI ------------------------------------------------------------------------------
    @staticmethod
    def add_argparse_args(parser):
        raise NotImplementedError

    def config_dict(self) -> dict:
        return dataclasses.asdict(self)


@SDERegistry.register("ouve")
@dataclasses.dataclass(frozen=True)
class OUVESDE(SDE):
    """Ornstein-Uhlenbeck Variance-Exploding SDE (reference sdes.py:144-232).

    dx = theta (y - x) dt + sigma_min (sigma_max/sigma_min)^t sqrt(2 log(sigma_max/sigma_min)) dw
    """

    theta: float = 1.5
    sigma_min: float = 0.05
    sigma_max: float = 0.5
    N: int = 30
    sampler_type: str = "pc"

    @staticmethod
    def add_argparse_args(parser):
        parser.add_argument("--theta", type=float, default=1.5,
                            help="The constant stiffness of the Ornstein-Uhlenbeck process. 1.5 by default.")
        parser.add_argument("--sigma-min", type=float, default=0.05,
                            help="The minimum sigma to use. 0.05 by default.")
        parser.add_argument("--sigma-max", type=float, default=0.5,
                            help="The maximum sigma to use. 0.5 by default.")
        parser.add_argument("--N", type=int, default=30,
                            help="The number of timesteps in the SDE discretization. 30 by default.")
        parser.add_argument("--sampler_type", type=str, default="pc",
                            help="Type of sampler to use. 'pc' by default.")
        return parser

    @property
    def logsig(self) -> float:
        return math.log(self.sigma_max / self.sigma_min)

    def sde(self, x, y, t):
        drift = self.theta * (y - x)
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        diffusion = sigma * math.sqrt(2.0 * self.logsig)
        return drift, diffusion

    def _mean(self, x0, y, t):
        exp_interp = _bcast(jnp.exp(-self.theta * t))
        return exp_interp * x0 + (1.0 - exp_interp) * y

    def _std(self, t):
        # Closed-form perturbation-kernel std (reference sdes.py:206-219).
        sm, theta, logsig = self.sigma_min, self.theta, self.logsig
        return jnp.sqrt(
            (sm**2 * jnp.exp(-2.0 * theta * t) * (jnp.exp(2.0 * (theta + logsig) * t) - 1.0) * logsig)
            / (theta + logsig)
        )

    def alpha(self, t):
        return jnp.exp(-self.theta * t)

    def marginal_prob(self, x0, y, t):
        return self._mean(x0, y, t), self._std(t)

    def prior_sampling(self, key, y):
        """x_T ~ N(y, sigma(T)^2 I) with complex circular noise (reference sdes.py:224-229)."""
        return self.prior_from_noise(crandn(key, y.shape), y)

    def prior_from_noise(self, z, y):
        std = self._std(jnp.ones((y.shape[0],), dtype=jnp.float32) * self.T)
        return y + z.astype(y.dtype) * _bcast(std).astype(y.dtype)


@SDERegistry.register("sbve")
@dataclasses.dataclass(frozen=True)
class SBVESDE(SDE):
    """Schroedinger-bridge Variance-Exploding SDE (reference sdes.py:235-313).

    Jukic et al., "Schroedinger Bridge for Generative Speech Enhancement", 2024.
    """

    k: float = 2.6
    c: float = 0.4
    N: int = 50
    eps: float = 1e-8
    sampler_type: str = "ode"

    @staticmethod
    def add_argparse_args(parser):
        parser.add_argument("--N", type=int, default=50,
                            help="The number of timesteps in the SDE discretization. 50 by default.")
        parser.add_argument("--k", type=float, default=2.6,
                            help="Parameter of the diffusion coefficient. 2.6 by default.")
        parser.add_argument("--c", type=float, default=0.4,
                            help="Parameter of the diffusion coefficient. 0.4 by default.")
        parser.add_argument("--eps", type=float, default=1e-8,
                            help="Small constant to avoid numerical instability. 1e-8 by default.")
        parser.add_argument("--sampler_type", type=str, default="ode")
        return parser

    def sde(self, x, y, t):
        drift = jnp.zeros_like(x)
        diffusion = math.sqrt(self.c) * self.k**t
        return drift, diffusion * jnp.ones_like(t)

    def sigmas_alphas(self, t):
        """Closed-form noise-schedule table (reference sdes.py:275-286).

        Numerically stabilized vs the reference: ``sigma_T^2 - sigma_t^2``
        suffers catastrophic cancellation as t -> T (the two large squares are
        rounded independently, and under XLA constant-folding the rounding can
        differ from the eager path, corrupting sigma_bar by ~10x). We compute
        the difference in closed form via expm1:
            sigma_T^2 - sigma_t^2 = c * k^{2t} * expm1(2 ln k (T - t)) / (2 ln k).
        """
        alpha_t = jnp.ones_like(t)
        alpha_T = jnp.ones_like(t)
        two_log_k = 2.0 * math.log(self.k)
        sigma_t = jnp.sqrt(self.c * jnp.expm1(two_log_k * t) / two_log_k)
        sigma_T = jnp.sqrt(self.c * math.expm1(two_log_k * self.T) / two_log_k) * jnp.ones_like(t)
        alpha_bart = alpha_t / (alpha_T + self.eps)
        var_diff = self.c * jnp.exp(two_log_k * t) * jnp.expm1(two_log_k * (self.T - t)) / two_log_k
        sigma_bart = jnp.sqrt(var_diff + self.eps)
        return sigma_t, sigma_T, sigma_bart, alpha_t, alpha_T, alpha_bart

    def _mean(self, x0, y, t):
        sigma_t, sigma_T, sigma_bart, alpha_t, alpha_T, alpha_bart = self.sigmas_alphas(t)
        w_xt = alpha_t * sigma_bart**2 / (sigma_T**2 + self.eps)
        w_yt = alpha_bart * sigma_t**2 / (sigma_T**2 + self.eps)
        return _bcast(w_xt) * x0 + _bcast(w_yt) * y

    def _std(self, t):
        sigma_t, sigma_T, sigma_bart, alpha_t, alpha_T, alpha_bart = self.sigmas_alphas(t)
        return alpha_t * sigma_bart * sigma_t / (sigma_T + self.eps)

    def marginal_prob(self, x0, y, t):
        return self._mean(x0, y, t), self._std(t)

    def prior_sampling(self, key, y):
        """x_T = y exactly (reference sdes.py:306-310)."""
        del key
        return y

    def prior_from_noise(self, z, y):
        del z  # the SB prior is noiseless
        return y


def crandn(key, shape, dtype=jnp.complex64):
    """Standard complex normal matching ``torch.randn_like`` on complex tensors:
    real and imaginary parts each ~ N(0, 1/2), so E|z|^2 = 1.
    """
    kr, ki = jax.random.split(key)
    scale = 1.0 / math.sqrt(2.0)
    re = jax.random.normal(kr, shape, dtype=jnp.float32) * scale
    im = jax.random.normal(ki, shape, dtype=jnp.float32) * scale
    return (re + 1j * im).astype(dtype)
