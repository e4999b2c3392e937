"""ScoreModel tests: forward contracts, losses, end-to-end enhance on a tiny net."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgmse_tpu.model import ScoreModel
from sgmse_tpu.sdes import crandn

TINY = dict(nf=16, ch_mult=(1, 1, 2), num_res_blocks=1, attn_resolutions=(16,),
            image_size=64, n_fft=126, hop_length=32, num_frames=64)
# n_fft=126 -> 64 freq bins, so the tiny U-Net sees (64, T) grids.


@pytest.fixture(scope="module")
def model_and_params():
    model = ScoreModel("ncsnpp", "ouve", **TINY)
    variables = model.init_params(jax.random.key(0), num_frames=64)
    return model, variables


def test_config_roundtrip(model_and_params):
    model, _ = model_and_params
    cfg = model.config_dict()
    model2 = ScoreModel.from_config(cfg)
    assert model2.backbone == "ncsnpp"
    assert model2.sde == model.sde
    assert model2.spec.n_fft == 126
    assert model2.dnn.nf == 16


def test_forward_legacy_contract(model_and_params):
    """Legacy backbones: score = -dnn(x_t, y, t) (reference model.py:306-310)."""
    model, variables = model_and_params
    x = crandn(jax.random.key(1), (2, 1, 64, 64))
    y = crandn(jax.random.key(2), (2, 1, 64, 64))
    t = jnp.asarray([0.5, 0.8])
    score = model.forward(variables, x, y, t)
    direct = model.dnn.apply(variables, x, y, t)
    np.testing.assert_allclose(np.asarray(score), np.asarray(-direct), atol=1e-6)


def test_step_loss_finite_and_positive(model_and_params):
    model, variables = model_and_params
    x = crandn(jax.random.key(1), (2, 1, 64, 64)) * 0.1
    y = crandn(jax.random.key(2), (2, 1, 64, 64)) * 0.1
    loss = model.step_loss(variables, (x, y), jax.random.key(3))
    assert np.isfinite(float(loss))
    assert float(loss) > 0


def test_score_matching_loss_formula():
    """loss = mean(0.5 * sum |sigma*score + z|^2) (reference model.py:139-146)."""
    model = ScoreModel("ncsnpp", "ouve", **TINY)
    b = 2
    t = jnp.asarray([0.4, 0.6])
    sigma = model.sde._std(t)[:, None, None, None]
    z = crandn(jax.random.key(0), (b, 1, 8, 8))
    score = crandn(jax.random.key(1), (b, 1, 8, 8))
    loss = model._loss(score, None, z, t, None, None)
    ref = np.mean(0.5 * np.sum(np.abs(np.asarray(score * sigma + z)) ** 2,
                               axis=(1, 2, 3)))
    np.testing.assert_allclose(float(loss), ref, rtol=1e-5)


def test_denoiser_loss_weightings():
    model = ScoreModel("ncsnpp_v2", "ouve", loss_type="denoiser",
                       loss_weighting="edm", **TINY)
    b = 2
    t = jnp.asarray([0.4, 0.6])
    score = crandn(jax.random.key(1), (b, 1, 8, 8))
    x_t = crandn(jax.random.key(2), (b, 1, 8, 8))
    mean = crandn(jax.random.key(3), (b, 1, 8, 8))
    loss = model._loss(score, x_t, None, t, mean, None)
    assert np.isfinite(float(loss))


def test_data_prediction_loss():
    model = ScoreModel("ncsnpp_v2", "sbve", loss_type="data_prediction", **TINY)
    b = 2
    f, tt = 64, 64
    t = jnp.asarray([0.4, 0.6])
    x_hat = crandn(jax.random.key(1), (b, 1, f, tt)) * 0.1
    x = crandn(jax.random.key(2), (b, 1, f, tt)) * 0.1
    loss = model._loss(x_hat, None, None, t, None, x)
    assert np.isfinite(float(loss))
    # zero error => zero loss
    loss0 = model._loss(x, None, None, t, None, x)
    assert float(loss0) < 1e-10


def test_v2_preconditioning_contract():
    model = ScoreModel("ncsnpp_v2", "ouve", loss_type="score_matching",
                       c_in="edm", c_out="edm", c_skip="edm", **TINY)
    variables = model.init_params(jax.random.key(0), num_frames=64)
    x = crandn(jax.random.key(1), (1, 1, 64, 64))
    y = crandn(jax.random.key(2), (1, 1, 64, 64))
    t = jnp.asarray([0.5])
    out = model.forward(variables, x, y, t)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out.real)))


def test_enhance_end_to_end(model_and_params):
    """Full pipeline on random audio: wav -> spec -> PC sampling -> wav."""
    model, variables = model_and_params
    rng = np.random.default_rng(0)
    y_wav = rng.standard_normal(4000).astype(np.float32) * 0.1
    x_hat = model.enhance(variables, y_wav, key=jax.random.key(0), N=3)
    assert x_hat.shape == y_wav.shape
    assert np.all(np.isfinite(x_hat))


def test_enhance_batched(model_and_params):
    model, variables = model_and_params
    rng = np.random.default_rng(0)
    y_wav = rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
    x_hat, nfe, rtf = model.enhance(variables, y_wav, key=jax.random.key(0), N=2,
                                    timeit=True)
    assert x_hat.shape == y_wav.shape
    assert nfe == 4
    assert rtf > 0


def test_enhance_sync_false_matches_sync_true(model_and_params):
    """The async double-buffer path (cli/enhance.py) returns a device array
    with identical values; timeit+sync=False is rejected."""
    model, variables = model_and_params
    rng = np.random.default_rng(0)
    y_wav = rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
    a = model.enhance(variables, y_wav, key=jax.random.key(3), N=2)
    b = model.enhance(variables, y_wav, key=jax.random.key(3), N=2, sync=False)
    np.testing.assert_array_equal(a, np.asarray(b))
    with pytest.raises(ValueError):
        model.enhance(variables, y_wav, key=jax.random.key(3), N=2,
                      sync=False, timeit=True)


def test_data_prediction_loss_with_pesq_weight():
    """C29 parity: --pesq_weight>0 adds the differentiable PESQ term."""
    model = ScoreModel("ncsnpp_v2", "sbve", loss_type="data_prediction",
                       pesq_weight=5e-4, **TINY)
    b, f, tt = 2, 64, 64
    t = jnp.asarray([0.4, 0.6])
    x = crandn(jax.random.key(2), (b, 1, f, tt)) * 0.1
    x_hat = x + crandn(jax.random.key(1), (b, 1, f, tt)) * 0.05
    loss = model._loss(x_hat, None, None, t, None, x)
    assert np.isfinite(float(loss))
    base = ScoreModel("ncsnpp_v2", "sbve", loss_type="data_prediction", **TINY)
    loss_nopesq = base._loss(x_hat, None, None, t, None, x)
    assert float(loss) != float(loss_nopesq)
    # gradient w.r.t. the prediction stays finite through the PESQ term
    g = jax.grad(lambda xh: model._loss(xh, None, None, t, None, x).real)(x_hat)
    assert np.all(np.isfinite(np.asarray(g.real)))


def test_enhance_long_chunked_ola(model_and_params):
    """Chunked overlap-add enhancement: length-preserving, finite, and close
    to the unchunked path on a short signal (identical when no chunking)."""
    model, variables = model_and_params
    rng = np.random.default_rng(0)
    y = rng.standard_normal(9000).astype(np.float32) * 0.1

    out = model.enhance_long(variables, y, chunk_seconds=0.25, overlap=0.2,
                             key=jax.random.key(0), N=2)
    assert out.shape == y.shape
    assert np.all(np.isfinite(out))

    # Shorter than one chunk -> exactly the plain enhance path.
    y_short = y[:3000]
    a = model.enhance_long(variables, y_short, chunk_seconds=1.0,
                           key=jax.random.key(1), N=2)
    b = model.enhance(variables, y_short, key=jax.random.key(1), N=2)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_sampler_program_cache(model_and_params):
    """Repeated sampler construction reuses the compiled program (no retrace
    per enhance call; the journey drive showed per-call recompiles cost ~60s
    on the TPU tunnel)."""
    model, variables = model_and_params
    model._program_cache = __import__("collections").OrderedDict()
    y = crandn(jax.random.key(0), (1, 1, 64, 64)) * 0.1
    s1 = model.get_pc_sampler("reverse_diffusion", "ald", variables, y,
                              N=3, snr=0.5)
    s1(jax.random.key(1))
    assert len(model._program_cache) == 1
    y2 = crandn(jax.random.key(2), (2, 1, 64, 64)) * 0.1  # new batch size: same program
    s2 = model.get_pc_sampler("reverse_diffusion", "ald", variables, y2,
                              N=3, snr=0.5)
    s2(jax.random.key(3))
    assert len(model._program_cache) == 1
    # Different sampler settings -> a separate cache entry.
    s3 = model.get_pc_sampler("reverse_diffusion", "ald", variables, y,
                              N=5, snr=0.5)
    assert len(model._program_cache) == 2
    # New params object -> entry rebuilt in place (same key).
    variables2 = jax.tree.map(lambda a: a + 0.0, variables)
    model.get_pc_sampler("reverse_diffusion", "ald", variables2, y, N=3, snr=0.5)
    assert len(model._program_cache) == 2


def test_enhance_default_key_is_deterministic(model_and_params):
    """key=None must mean a fixed key, not a wall-clock seed (VERDICT weak #6):
    the framework's reproducibility stance is explicit keys everywhere."""
    model, variables = model_and_params
    rng = np.random.default_rng(7)
    y = rng.standard_normal(2000).astype(np.float32) * 0.1
    a = model.enhance(variables, y, N=3)
    b = model.enhance(variables, y, N=3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = model.enhance(variables, y, N=3, key=jax.random.key(123))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_enhance_sampler_type_argument_is_honored(model_and_params):
    """enhance(sampler_type=...) must win over the SDE's own field, like the
    reference's --sampler_type flag (enhancement.py:80-88). Regression for a
    round-2 bug where the argument was accepted and silently ignored."""
    model, variables = model_and_params
    rng = np.random.default_rng(0)
    y_wav = rng.standard_normal(4000).astype(np.float32) * 0.1
    assert model.sde.sampler_type == "pc"  # field says pc; argument says ode
    x_ode = model.enhance(variables, y_wav, key=jax.random.key(0),
                          sampler_type="ode", N=3)
    assert x_ode.shape == y_wav.shape and np.all(np.isfinite(x_ode))
    # the ODE path is deterministic given the prior draw; PC with ald is not —
    # outputs must differ if the argument actually switched samplers
    x_pc = model.enhance(variables, y_wav, key=jax.random.key(0), N=3)
    assert not np.allclose(x_ode, x_pc)


def test_enhance_intermediate_returns_trajectory(model_and_params):
    """enhance(intermediate=True) must return (x_hat, trajectory) on the PC
    path. Regression for a round-2 bug where the flag was forwarded into the
    sampler (changing its return to a tuple) but enhance() still indexed the
    result as a spec array and crashed with TypeError."""
    model, variables = model_and_params
    rng = np.random.default_rng(0)
    y_wav = rng.standard_normal(4000).astype(np.float32) * 0.1
    x_hat, traj = model.enhance(variables, y_wav, key=jax.random.key(0), N=3,
                                intermediate=True)
    assert x_hat.shape == y_wav.shape and np.all(np.isfinite(x_hat))
    assert traj.shape[0] == 3  # one spec-domain state per predictor step
    assert np.all(np.isfinite(np.abs(np.asarray(traj))))
    # without the flag the return contract is unchanged
    x_plain = model.enhance(variables, y_wav, key=jax.random.key(0), N=3)
    np.testing.assert_array_equal(np.asarray(x_plain), np.asarray(x_hat))


def test_enhance_eval_matches_enhance(model_and_params):
    """enhance_eval (params as jit ARGUMENTS, one fused program) must produce
    the same waveform as enhance (params by closure, cached per params
    identity) for the same key — the two paths differ only in how the params
    reach the compiled program."""
    model, variables = model_and_params
    rng = np.random.default_rng(5)
    y_wav = rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
    a = model.enhance(variables, y_wav, key=jax.random.key(11), N=3)
    b = model.enhance_eval(variables, y_wav, key=jax.random.key(11), N=3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
    # 1-D input round-trips like enhance.
    c = model.enhance_eval(variables, y_wav[0], key=jax.random.key(11), N=3)
    assert c.shape == y_wav[0].shape


def test_enhance_eval_reuses_program_across_params():
    """The whole point: fresh params must NOT rebuild the program (the
    in-training validation pathology — enhance() rebuilt + recompiled per
    validation because its cache keys on params identity)."""
    model = ScoreModel("ncsnpp", "ouve", **TINY)
    variables = model.init_params(jax.random.key(0), num_frames=64)
    rng = np.random.default_rng(6)
    y_wav = rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
    model.enhance_eval(variables, y_wav, key=jax.random.key(0), N=2)
    n_eval_entries = sum(1 for k in model._program_cache if k[0] == "eval_enhance")
    assert n_eval_entries == 1
    bumped = jax.tree.map(lambda a: a + 1e-6 if a.dtype == jnp.float32 else a,
                          variables)
    out = model.enhance_eval(bumped, y_wav, key=jax.random.key(0), N=2)
    assert np.all(np.isfinite(np.asarray(out)))
    n_eval_entries = sum(1 for k in model._program_cache if k[0] == "eval_enhance")
    assert n_eval_entries == 1, "fresh params rebuilt the eval program"


def test_program_cache_is_lru_bounded():
    """Sweeping many sampler configs must not retain one compiled executable
    per config: each entry can hold a 65M-constant program, so the cache is
    LRU-capped at ScoreModel.program_cache_size."""
    model = ScoreModel("ncsnpp", "ouve", **TINY)
    built = []
    for i in range(100):
        model._cached_program(("cfg", i), None, lambda i=i: built.append(i) or i)
    assert len(built) == 100
    assert len(model._program_cache) == model.program_cache_size
    assert ("cfg", 99) in model._program_cache  # most recent survives
    assert ("cfg", 0) not in model._program_cache  # LRU evicted
    # A cache hit refreshes recency without rebuilding.
    assert model._cached_program(("cfg", 99), None, lambda: None) == 99
    assert len(built) == 100
    model._cached_program(("cfg", 100), None, lambda: 100)
    assert ("cfg", 99) in model._program_cache


def test_enhance_eval_sb_dispatch():
    """SBVE: enhance_eval uses the SB sampler (pc maps to ode like the
    reference enhancement.py:88), matches enhance(), and — like enhance()
    and the reference (model.py:452 passes no N) — IGNORES the N argument,
    always running self.sde.N steps."""
    model = ScoreModel("ncsnpp_v2", "sbve", loss_type="data_prediction",
                       N=4, **TINY)
    assert model.sde.N == 4
    variables = model.init_params(jax.random.key(1), num_frames=64)
    rng = np.random.default_rng(7)
    y_wav = rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
    with pytest.warns(UserWarning, match="timeit"):
        a, nfe, _ = model.enhance(variables, y_wav, key=jax.random.key(2),
                                  N=3, timeit=True)
    assert nfe == 4, "enhance must ignore N on the SB path (sde.N wins)"
    b = model.enhance_eval(variables, y_wav, key=jax.random.key(2), N=3)
    # The cached eval program must be keyed on self.sde (N=4), not on the
    # ignored N=3 — pinning that both paths ran the same step count.
    eval_keys = [k for k in model._program_cache if k[0] == "eval_enhance"]
    assert eval_keys == [("eval_enhance", model.sde, "sb", "ode", "zero_pad")]
    # One fused program vs three separate programs: XLA fuses/reorders f32
    # ops differently, so agreement is to rounding (~1e-5), not bit-exact.
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
