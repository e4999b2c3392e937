"""Torch-anchored parity against the reference's EXECUTABLE code.

Closes VERDICT r3 "What's missing" #2/#3 and "Next round" items 2-4:

- Training-loss math: identical (x, y, t, z) through the reference's actual
  ``ScoreModel._loss``/``forward`` (model.py:127-198, 264-341; imported
  executable via tests/_reference_shim.py) vs ours, for score_matching,
  denoiser weightings {1, sigma^2}, and data_prediction (l1 path) — plus an
  executable record of the reference's edm-weighting broadcast bug.
- SB pipeline end-to-end: the reference's ``get_sb_sampler``
  (sampling/__init__.py:145-249) driven through the full enhancement
  pipeline (ODE variant, noise-free) and at the spec level with the exact
  torch noise sequence injected (SDE variant).
- ODE path: the reference's scipy RK45 (rtol=atol=1e-5,
  sampling/__init__.py:121-131) vs our on-device adaptive DP5(4), same
  converted weights, same prior draw: terminal-state agreement within solver
  tolerance and NFE within ~2x.

Everything runs on CPU with tiny configs; the full-default-size analogues
live in tools/ (see tools/pipeline_parity_fullsize.py).
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

from _reference_shim import make_reference_scoremodel  # noqa: E402

from sgmse_tpu import convert, sampling  # noqa: E402
from sgmse_tpu.model import ScoreModel  # noqa: E402
from sgmse_tpu.utils.metrics import si_sdr  # noqa: E402

SMALL = dict(nf=16, ch_mult=(1, 1, 2), num_res_blocks=1, attn_resolutions=(16,),
             image_size=64)
DSP = dict(n_fft=126, hop_length=32, num_frames=64)
SR = 16000


def _rand_complex(rng, shape, scale=0.3):
    return ((rng.standard_normal(shape) + 1j * rng.standard_normal(shape))
            .astype(np.complex64) * scale)


def _crandn_np(rng, shape):
    """Standard complex normal matching torch.randn_like on complex tensors."""
    return (((rng.standard_normal(shape) + 1j * rng.standard_normal(shape))
             / np.sqrt(2.0)).astype(np.complex64))


def _build_pair(backbone, sde_name, **cfg):
    """Reference ScoreModel (executable) + our ScoreModel with converted
    weights. Returns (ref_model, our_model, variables)."""
    full = {**SMALL, **DSP, **cfg}
    ref = make_reference_scoremodel(backbone, sde_name, **full)
    ref.eval()  # EMA stub never swaps weights: live weights on both sides
    sd = {k: v.numpy() for k, v in ref.dnn.state_dict().items()}
    params = convert.convert_ncsnpp_state_dict(sd, **SMALL)
    ours = ScoreModel(backbone, sde_name, **full)
    return ref, ours, {"params": params}


def _loss_both_sides(ref, ours, variables, seed=0):
    """Feed the SAME (x, y, t, z) through reference _step's recipe
    (model.py:189-198) on both sides; return (loss_ref, loss_ours)."""
    rng = np.random.default_rng(seed)
    b, f, tt = 2, 64, 64
    x = _rand_complex(rng, (b, 1, f, tt))
    y = x + _rand_complex(rng, (b, 1, f, tt), scale=0.1)
    z = _crandn_np(rng, (b, 1, f, tt))
    t = rng.uniform(ref.t_eps, 1.0, b).astype(np.float32)

    tx, ty, tz, ttt = map(torch.from_numpy, (x, y, z, t))
    with torch.no_grad():
        mean, std = ref.sde.marginal_prob(tx, ty, ttt)
        # Some reference SDE tables promote to float64 via python-scalar
        # torch.tensor(...) intermediates; the training path runs f32.
        mean, std = mean.to(torch.complex64), std.to(torch.float32)
        x_t = mean + std[:, None, None, None] * tz
        forward_out = ref(x_t, ty, ttt)
        loss_ref = ref._loss(forward_out, x_t, tz, ttt, mean, tx).item()

    jx, jy, jz, jt = map(jnp.asarray, (x, y, z, t))
    jmean, jstd = ours.sde.marginal_prob(jx, jy, jt)
    jx_t = jmean + jstd[:, None, None, None] * jz
    jfwd = ours.forward(variables, jx_t, jy, jt, train=False)
    loss_ours = float(ours._loss(jfwd, jx_t, jz, jt, jmean, jx))
    return loss_ref, loss_ours


# ---------------------------------------------------------------------------------
# Training-loss anchors (reference model.py:127-198)
# ---------------------------------------------------------------------------------

@pytest.mark.parametrize("backbone,sde_name,cfg", [
    # The SGMSE+ recipe: legacy score contract + Eq. (7).
    ("ncsnpp", "ouve", dict(loss_type="score_matching", loss_weighting="sigma^2")),
    # v2 preconditioned score contract (c_out/c_skip) + Eq. (7).
    ("ncsnpp_v2", "ouve", dict(loss_type="score_matching", loss_weighting="sigma^2",
                               c_out="sigma")),
    # denoiser loss, both valid weightings, with edm c_in + network scaling.
    ("ncsnpp_v2", "ouve", dict(loss_type="denoiser", loss_weighting="1",
                               c_in="edm", network_scaling="1/sigma")),
    ("ncsnpp_v2", "ouve", dict(loss_type="denoiser", loss_weighting="sigma^2")),
    # The SB recipe (README.md:93): data prediction, TF-MSE + l1 time loss.
    ("ncsnpp_v2", "sbve", dict(loss_type="data_prediction", l1_weight=0.001)),
    # data prediction with full edm preconditioning.
    ("ncsnpp_v2", "sbve", dict(loss_type="data_prediction", l1_weight=0.001,
                               c_in="edm", c_out="edm", c_skip="edm")),
])
def test_training_loss_parity(backbone, sde_name, cfg):
    ref, ours, variables = _build_pair(backbone, sde_name, **cfg)
    loss_ref, loss_ours = _loss_both_sides(ref, ours, variables)
    assert np.isfinite(loss_ref)
    np.testing.assert_allclose(loss_ours, loss_ref, rtol=2e-4), (loss_ours, loss_ref)


def test_denoiser_edm_weighting_reference_bug_documented():
    """The reference's edm weighting (model.py:156) applies [:, None, None,
    None] to an ALREADY-expanded sigma, broadcasting a (B,1,1,1,1,1,1) weight
    against (B,C,F,T) losses => a (B,1,1,B,C,F,T) tensor with batch
    cross-terms. We implement the intended (B,1,1,1) weighting. This test
    executes the reference path and records the divergence."""
    ref, ours, variables = _build_pair(
        "ncsnpp_v2", "ouve", loss_type="denoiser", loss_weighting="edm")
    rng = np.random.default_rng(1)
    b, f, tt = 2, 64, 64
    x = _rand_complex(rng, (b, 1, f, tt))
    y = x + _rand_complex(rng, (b, 1, f, tt), scale=0.1)
    z = _crandn_np(rng, (b, 1, f, tt))
    t = rng.uniform(0.03, 1.0, b).astype(np.float32)

    tx, ty, tz, ttt = map(torch.from_numpy, (x, y, z, t))
    with torch.no_grad():
        mean, std = ref.sde.marginal_prob(tx, ty, ttt)
        x_t = mean + std[:, None, None, None] * tz
        forward_out = ref(x_t, ty, ttt)
        loss_ref = ref._loss(forward_out, x_t, tz, ttt, mean, tx).item()
        # The intended math, computed with correct broadcasting from the same
        # reference forward output:
        sigma = ref.sde._std(ttt)[:, None, None, None]
        D = forward_out * sigma.pow(2) + x_t
        losses = torch.square(torch.abs(D - mean))
        w = (sigma**2 + ref.sigma_data**2) / ((sigma * ref.sigma_data) ** 2)
        intended = torch.mean(
            0.5 * torch.sum((w * losses).reshape(b, -1), dim=-1)).item()

    jx, jy, jz, jt = map(jnp.asarray, (x, y, z, t))
    jmean, jstd = ours.sde.marginal_prob(jx, jy, jt)
    jx_t = jmean + jstd[:, None, None, None] * jz
    jfwd = ours.forward(variables, jx_t, jy, jt, train=False)
    loss_ours = float(ours._loss(jfwd, jx_t, jz, jt, jmean, jx))

    # Ours == the intended weighting; the reference's executed value differs
    # (cross-batch broadcast inflates the sum by ~B plus cross-terms).
    np.testing.assert_allclose(loss_ours, intended, rtol=2e-4)
    assert abs(loss_ref - intended) / intended > 0.1, (
        "reference edm bug apparently fixed upstream — update model.py note")


# ---------------------------------------------------------------------------------
# Schroedinger-bridge pipeline anchors (reference sampling/__init__.py:145-249)
# ---------------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sb_setup():
    ref, ours, variables = _build_pair(
        "ncsnpp_v2", "sbve", loss_type="data_prediction", N=6)
    assert ref.sde.N == 6 and ours.sde.N == 6
    return ref, ours, variables


@pytest.fixture(scope="module")
def noisy_wav():
    rng = np.random.default_rng(3)
    t = np.arange(SR) / SR
    clean = (0.4 * np.sin(2 * np.pi * 330 * t)
             * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    return clean + 0.05 * rng.standard_normal(SR).astype(np.float32)


def _ref_sb_spec_input(ref, y_wav):
    """Reference enhancement front-end for the v2/SB family
    (enhancement.py:62-77, pad_mode='reflection' per lines 49-51)."""
    from sgmse.util.other import pad_spec
    y = torch.from_numpy(y_wav)[None]
    t_orig = y.size(1)
    norm = y.abs().max()
    Y = torch.unsqueeze(ref._forward_transform(ref._stft(y / norm)), 0)
    return pad_spec(Y, mode="reflection"), t_orig, norm


def test_sb_ode_pipeline_waveform_parity(sb_setup, noisy_wav):
    """Full SB enhancement pipeline, ODE variant (the SB default and the
    published-checkpoint path): noise-free, so same weights => same waveform."""
    ref, ours, variables = sb_setup
    Y, t_orig, norm = _ref_sb_spec_input(ref, noisy_wav)
    with torch.no_grad():
        sampler = ref.get_sb_sampler(sde=ref.sde, y=Y, sampler_type="ode")
        sample, _ = sampler()
        x_ref = (ref.to_audio(sample.squeeze(), t_orig) * norm).numpy()

    x_ours = ours.enhance(variables, noisy_wav, key=jax.random.key(0),
                          sampler_type="ode", pad_mode="reflection")
    assert x_ours.shape == x_ref.shape
    scale = np.abs(x_ref).max()
    assert np.max(np.abs(x_ours - x_ref)) < 1e-3 * scale, (
        np.max(np.abs(x_ours - x_ref)) / scale)
    assert si_sdr(x_ref, x_ours) > 45.0


def test_sb_sde_sampler_spec_parity(sb_setup, noisy_wav):
    """SB-SDE variant with torch's exact per-step noise injected: the
    stochastic first-order discretization agrees state-for-state."""
    ref, ours, variables = sb_setup
    Y, _, _ = _ref_sb_spec_input(ref, noisy_wav)
    n = ref.sde.N

    seed = 5
    torch.manual_seed(seed)
    zs = torch.stack([torch.randn_like(Y[:, :1]) for _ in range(n)])
    torch.manual_seed(seed)
    with torch.no_grad():
        sampler = ref.get_sb_sampler(sde=ref.sde, y=Y, sampler_type="sde")
        sample_ref, _ = sampler()

    program, nfe = sampling.sb_sampler_program(
        ours.sde, ours.score_fn(variables), sampler_type="sde",
        inject_steps=True)
    assert nfe == n
    sample_ours = np.asarray(program(jax.random.key(0), jnp.asarray(Y.numpy()),
                                     jnp.asarray(zs.numpy())))
    ref_np = sample_ref.numpy()
    scale = np.abs(ref_np).max()
    assert np.max(np.abs(sample_ours - ref_np)) < 5e-4 * scale, (
        np.max(np.abs(sample_ours - ref_np)) / scale)


# ---------------------------------------------------------------------------------
# Probability-flow ODE anchor (reference sampling/__init__.py:73-143)
# ---------------------------------------------------------------------------------

def test_ode_solver_terminal_state_and_nfe_anchor():
    """Reference scipy RK45 vs our on-device adaptive DP5(4), same converted
    tiny model, same prior draw, same tolerances: terminal states agree within
    solver tolerance and NFE within ~2x — our adaptive solver IS the
    reference's path, just on-device."""
    from sgmse.sdes import OUVESDE
    from sgmse.sampling import get_ode_sampler
    from sgmse.backbones.ncsnpp import NCSNpp as TorchNCSNpp

    torch.manual_seed(0)
    tm = TorchNCSNpp(**SMALL)
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert.convert_ncsnpp_state_dict(sd, **SMALL)

    rng = np.random.default_rng(2)
    b, f, tt = 1, 64, 64
    y = _rand_complex(rng, (b, 1, f, tt), scale=0.1)
    z = _crandn_np(rng, (b, 1, f, tt))  # shared prior draw

    def score_fn_torch(x, yy, t):
        with torch.no_grad():
            return -tm(torch.cat([x, yy], dim=1), t)  # model.py:307-309

    sde_t = OUVESDE(theta=1.5, sigma_min=0.05, sigma_max=0.5, N=30)
    ty = torch.from_numpy(y)
    # Inject the shared prior: x_T = y + sigma(T) * z (sdes.py:224-229).
    std_T = sde_t._std(torch.ones(b))
    x_T = (ty + std_T[:, None, None, None] * torch.from_numpy(z)
           ).to(torch.complex64)
    orig_prior = sde_t.prior_sampling
    sde_t.prior_sampling = lambda shape, yy: x_T

    # Reference bug, recorded executably: get_ode_sampler's denoise_update_fn
    # calls predictor.update_fn(x, y, vec_eps) WITHOUT the required stepsize
    # (sampling/__init__.py:99-101 vs predictors.py:59), so the reference's
    # ODE path with denoise=True (its own default!) raises TypeError. The
    # executable reference therefore only defines the denoise=False path;
    # our denoise step implements the documented intent (one reverse-
    # diffusion mean step at t=eps) and is unit-tested separately.
    with torch.no_grad():
        broken = get_ode_sampler(sde_t, score_fn_torch, ty, device="cpu",
                                 rtol=1e-5, atol=1e-5, eps=3e-2, denoise=True)
        with pytest.raises(TypeError):
            broken()

    sampler = get_ode_sampler(sde_t, score_fn_torch, ty, device="cpu",
                              rtol=1e-5, atol=1e-5, eps=3e-2, denoise=False)
    with torch.no_grad():
        x_ref, nfe_ref = sampler()
    sde_t.prior_sampling = orig_prior
    x_ref = x_ref.numpy()

    ours = ScoreModel("ncsnpp", "ouve", **SMALL, **DSP)
    program = sampling.ode_sampler_program(
        ours.sde, ours.score_fn({"params": params}), denoise=False, eps=3e-2,
        method="rk45", rtol=1e-5, atol=1e-5, inject_prior=True)
    x_ours, nfe_ours = program(jax.random.key(0), jnp.asarray(y), jnp.asarray(z))
    x_ours = np.asarray(x_ours)

    assert x_ours.shape == x_ref.shape
    scale = np.abs(x_ref).max()
    rel = np.max(np.abs(x_ours - x_ref)) / scale
    # Two different adaptive controllers at rtol=atol=1e-5: terminal states
    # agree to solver-tolerance level, far below any audible difference.
    assert rel < 5e-3, rel
    # NFE parity: our controller implements scipy's (same DP5(4) tableau,
    # RMS error norm, SAFETY/MIN/MAX factors, select_initial_step, post-
    # rejection growth clamp), so the adaptive step counts track each other;
    # the residual slack covers f32-vs-f64 error-estimate rounding flipping
    # an accept/reject decision near enorm=1.
    assert nfe_ref / 1.3 <= nfe_ours <= nfe_ref * 1.3, (nfe_ours, nfe_ref)
