"""Data-parallel (mesh-sharded) enhancement tests.

`ScoreModel.enhance(mesh=...)` shards the utterance batch over a 1-D 'data'
mesh for multi-chip inference throughput (the reference's DDP is
training-only; it has no inference-parallelism equivalent, enhancement.py
processes one file per sampler launch). Sharding must change layout only,
never values — these tests pin that, plus the batch padding to a multiple of
the mesh size, on the 8-virtual-device CPU mesh from conftest.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgmse_tpu.model import ScoreModel
from sgmse_tpu.parallel.mesh import make_data_mesh

TINY = dict(nf=16, ch_mult=(1, 1, 2), num_res_blocks=1, attn_resolutions=(16,),
            image_size=64, n_fft=126, hop_length=32, num_frames=64)


@pytest.fixture(scope="module")
def model_and_params():
    model = ScoreModel("ncsnpp", "ouve", **TINY)
    variables = model.init_params(jax.random.key(0), num_frames=64)
    return model, variables


def _noisy_batch(batch, n=2048, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((batch, n)) * 0.1).astype(np.float32)


def test_mesh_enhance_matches_single_device(model_and_params):
    """Same key, same input: sharded == unsharded (bit-layout only)."""
    model, variables = model_and_params
    y = _noisy_batch(4)
    key = jax.random.key(7)
    ref = model.enhance(variables, y, key=key, N=3)
    out = model.enhance(variables, y, key=key, N=3, mesh=make_data_mesh(4))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_mesh_enhance_pads_indivisible_batches(model_and_params):
    """Batch 3 over 4 devices: zero-padded to 4 internally, 3 rows returned.

    The noise draw covers the PADDED (4, ...) shape, so the reference for a
    value comparison is the same key on a manually zero-padded UNSHARDED
    batch of 4 — not the 3-row program, whose threefry counter layout
    differs."""
    model, variables = model_and_params
    y = _noisy_batch(3, seed=1)
    key = jax.random.key(9)
    y4 = np.concatenate([y, np.zeros((1, y.shape[-1]), np.float32)])
    ref = model.enhance(variables, y4, key=key, N=3)[:3]
    out = model.enhance(variables, y, key=key, N=3, mesh=make_data_mesh(4))
    assert out.shape == (3, y.shape[-1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_mesh_sampler_compiles_with_zero_collectives(model_and_params):
    """The partitioned N-step sampler HLO contains NO collective ops.

    The score network has no cross-batch operations, so sharding the
    utterance batch over the 'data' mesh must partition every program
    embarrassingly — XLA should insert zero all-reduce / all-gather /
    collective-permute / all-to-all ops. This is the compile-level proof of
    the near-linear multi-chip inference scaling claim (anything else means
    a sharding annotation regressed and resharding traffic would ride ICI).
    """
    # Fresh model instance (same architecture, fixture's params): the program
    # cache must contain exactly the sampler built below — the module-scoped
    # fixture's cache already holds the earlier tests' enhance() sampler under
    # a different "pc" key, which is what the single-entry unpack reads.
    _, variables = model_and_params
    model = ScoreModel("ncsnpp", "ouve", **TINY)
    from sgmse_tpu.parallel.mesh import data_sharding
    from sgmse_tpu import dsp

    mesh = make_data_mesh(8)
    y = _noisy_batch(8, seed=3)
    # Same prep as model.enhance: STFT + compression + pad, then shard.
    spec = model.spec
    y_spec = dsp.pad_spec(spec.wav_to_spec(jnp.asarray(y))[:, None],
                          mode="zero_pad")
    y_spec = jax.device_put(y_spec, data_sharding(mesh))
    sampler = model.get_pc_sampler("reverse_diffusion", "ald", variables,
                                   y_spec, N=3)
    # get_pc_sampler caches the raw jitted program on the model.
    (program_vars, (program, _nfe)), = [
        v for k, v in model._program_cache.items() if k[0] == "pc"]
    hlo = program.lower(jax.random.key(0), y_spec).compile().as_text()
    for op in ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter"):
        assert op not in hlo, f"sharded sampler HLO contains {op}"


def test_mesh_enhance_sync_false_returns_device_array(model_and_params):
    model, variables = model_and_params
    y = _noisy_batch(2, seed=2)
    out = model.enhance(variables, y, key=jax.random.key(3), N=2,
                        mesh=make_data_mesh(2), sync=False)
    assert isinstance(out, jax.Array)
    host = np.asarray(out)
    assert host.shape == (2, y.shape[-1])
    assert np.isfinite(host).all()
