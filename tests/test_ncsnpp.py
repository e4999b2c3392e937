"""NCSN++ backbone tests: shapes, variants, gradient flow."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgmse_tpu.models import BackboneRegistry, NCSNpp, NCSNpp_48k, NCSNpp_v2

SMALL = dict(nf=16, ch_mult=(1, 1, 2), num_res_blocks=1, attn_resolutions=(16,),
             image_size=64)


def _make_inputs(key, b=2, f=64, t=64):
    kx, ky, kt = jax.random.split(key, 3)
    x = (jax.random.normal(kx, (b, 1, f, t)) + 1j * jax.random.normal(kx, (b, 1, f, t))).astype(jnp.complex64)
    y = (jax.random.normal(ky, (b, 1, f, t)) + 1j * jax.random.normal(ky, (b, 1, f, t))).astype(jnp.complex64)
    t_vec = jax.random.uniform(kt, (b,), minval=0.03, maxval=1.0)
    return x, y, t_vec


def test_registry_names():
    names = set(BackboneRegistry.get_all_names())
    assert {"ncsnpp", "ncsnpp_v2", "ncsnpp_48k"} <= names


@pytest.mark.parametrize("cls", [NCSNpp, NCSNpp_v2, NCSNpp_48k])
def test_forward_shapes(cls):
    model = cls(**SMALL)
    x, y, t = _make_inputs(jax.random.key(0))
    variables = model.init(jax.random.key(1), x, y, t)
    out = model.apply(variables, x, y, t)
    assert out.shape == x.shape
    assert out.dtype == jnp.complex64
    assert np.all(np.isfinite(np.asarray(out.real)))


def test_attention_applied_at_16():
    """Attention params must exist exactly at the F==16 resolution levels."""
    model = NCSNpp(**SMALL)
    x, y, t = _make_inputs(jax.random.key(0))
    variables = model.init(jax.random.key(1), x, y, t)
    names = set(variables["params"].keys())
    # 64 -> level0: F=64, level1: F=32, level2: F=16 => attn at level 2 + mid
    assert any(n.startswith("down_2_attn") for n in names)
    assert "mid_attn" in names
    assert not any(n.startswith("down_0_attn") for n in names)


def test_param_count_full_config():
    """Full default config should land at the reference's ~65M params
    (SURVEY.md C16: NCSNpp ~65M params)."""
    model = NCSNpp()
    x, y, t = _make_inputs(jax.random.key(0), b=1, f=256, t=64)
    variables = jax.eval_shape(lambda: model.init(jax.random.key(1), x, y, t))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert 60e6 < n_params < 70e6, f"got {n_params/1e6:.1f}M params"


def test_grad_flows():
    model = NCSNpp_v2(**SMALL)
    x, y, t = _make_inputs(jax.random.key(0))
    variables = model.init(jax.random.key(1), x, y, t)

    def loss(params):
        out = model.apply({"params": params}, x, y, t)
        return jnp.mean(jnp.abs(out) ** 2)

    g = jax.grad(loss)(variables["params"])
    gnorms = [float(jnp.linalg.norm(v)) for v in jax.tree.leaves(g)]
    assert all(np.isfinite(gnorms))
    # the Fourier projection W is stop-gradient'd
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    for path, leaf in flat:
        pathstr = jax.tree_util.keystr(path)
        if "fourier" in pathstr:
            assert float(jnp.linalg.norm(leaf)) == 0.0
        else:
            assert float(jnp.linalg.norm(leaf)) >= 0.0


def test_48k_long_utterance_shape():
    """48k variant must handle non-square F x T inputs (F=768, long T)."""
    model = NCSNpp_48k(nf=8, ch_mult=(1, 2), num_res_blocks=1, image_size=768)
    x, y, t = _make_inputs(jax.random.key(0), b=1, f=768, t=128)
    variables = model.init(jax.random.key(1), x, y, t)
    out = model.apply(variables, x, y, t)
    assert out.shape == x.shape
