"""Serving layer tests: dynamic batching, buckets, long-path routing, HTTP.

Runs a tiny NCSN++ on the CPU backend with N=2 sampling steps — the point is
the batching/queueing/IO machinery, not audio quality.
"""
import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

import jax

from sgmse_tpu.model import ScoreModel
from sgmse_tpu.serve import BatchingEnhancer, _ceil64, _next_pow2

TINY = dict(nf=16, ch_mult=(1, 1, 2), num_res_blocks=1, attn_resolutions=(16,),
            image_size=64, n_fft=126, hop_length=32, num_frames=64)
SAMPLER = dict(N=2, corrector="none", corrector_steps=0)


@pytest.fixture(scope="module")
def model_and_params():
    model = ScoreModel("ncsnpp", "ouve", sr=16000, **TINY)
    variables = model.init_params(jax.random.key(0), num_frames=64)
    return model, variables


def make_enhancer(model, variables, **kw):
    kw.setdefault("max_batch", 4)
    kw.setdefault("max_delay_ms", 80.0)
    kw.setdefault("max_seconds", 1.0)
    kw.setdefault("chunk_seconds", 0.5)
    kw.setdefault("sampler_kwargs", SAMPLER)
    return BatchingEnhancer(model, variables, **kw)


def test_pow2_and_bucket_helpers(model_and_params):
    assert [_next_pow2(n) for n in (1, 2, 3, 4, 5, 8, 9)] == [1, 2, 4, 4, 8, 8, 16]
    assert _ceil64(1) == 64 and _ceil64(64) == 64 and _ceil64(65) == 128
    model, variables = model_and_params
    with make_enhancer(model, variables) as enh:
        b = enh.bucket_for(2000)  # 1 + 2000//32 = 63 -> 64 frames
        assert b == 64
        # samples_for_bucket produces exactly that frame count, >= the input
        assert enh.samples_for_bucket(b) >= 2000
        assert enh.bucket_for(16000 * 2) is None  # > max_seconds -> long path


def test_batched_requests_one_program(model_and_params):
    """4 same-bucket requests submitted together run as ONE batch."""
    model, variables = model_and_params
    rng = np.random.default_rng(0)
    with make_enhancer(model, variables, max_delay_ms=200.0) as enh:
        wavs = [rng.standard_normal(1800 + 40 * i).astype(np.float32) * 0.1
                for i in range(4)]
        futs = [enh.submit(w) for w in wavs]
        outs = [f.result(timeout=300) for f in futs]
    for w, o in zip(wavs, outs):
        assert o.shape == w.shape
        assert np.all(np.isfinite(o))
    s = enh.stats()
    assert s["requests"] == 4
    assert s["batches"] == 1  # all four fit one launch within the delay window
    assert s["batched_rows"] == 4
    assert s["errors"] == 0


def test_max_delay_launches_partial_batch(model_and_params):
    """A lone request must not wait forever for batch-mates."""
    model, variables = model_and_params
    rng = np.random.default_rng(1)
    with make_enhancer(model, variables, max_delay_ms=30.0) as enh:
        out = enh.enhance(rng.standard_normal(1600).astype(np.float32) * 0.1,
                          timeout=300)
    assert out.shape == (1600,)
    assert enh.stats()["batches"] == 1


def test_long_input_routes_through_enhance_long(model_and_params):
    model, variables = model_and_params
    rng = np.random.default_rng(2)
    wav = rng.standard_normal(32000).astype(np.float32) * 0.1  # 2 s > 1 s cap
    with make_enhancer(model, variables) as enh:
        out = enh.enhance(wav, timeout=600)
    assert out.shape == wav.shape
    assert np.all(np.isfinite(out))
    assert enh.stats()["long_requests"] == 1


def test_error_propagates_to_future(model_and_params):
    model, variables = model_and_params
    with make_enhancer(model, variables) as enh:
        with pytest.raises(ValueError):
            enh.submit(np.zeros((2, 100), np.float32))  # 2-D rejected at submit
        # A request that fails inside the dispatcher sets the exception on
        # its future (inject by breaking the sampler kwargs).
        enh.sampler_kwargs["corrector"] = "no_such_corrector"
        fut = enh.submit(np.zeros(1600, np.float32))
        with pytest.raises(Exception):
            fut.result(timeout=300)
    assert enh.stats()["errors"] == 1


def test_cold_bucket_does_not_block_warm_bucket(model_and_params):
    """A cold bucket's compile stall must not block dispatch of a warm
    bucket's batch (VERDICT r4 item 10): batch execution runs on a pool, so
    only the dispatcher's (cheap) grouping is serialized."""
    import time as _time

    model, variables = model_and_params
    stall = threading.Event()

    class ColdBucketModel:
        """Model proxy: enhance() on the 128-frame bucket blocks (simulated
        remote compile) until released; the 64-frame bucket is warm."""

        def __getattr__(self, name):
            return getattr(model, name)

        def enhance(self, variables, yb, **kw):
            if yb.shape[1] > 3000:  # 128-frame bucket (4064 samples)
                stall.wait(timeout=30)
            return model.enhance(variables, yb, **kw)

    rng = np.random.default_rng(7)
    cold_wav = rng.standard_normal(3500).astype(np.float32) * 0.1  # 128 frames
    warm_wav = rng.standard_normal(1600).astype(np.float32) * 0.1  # 64 frames
    with make_enhancer(ColdBucketModel(), variables, max_delay_ms=20.0) as enh:
        enh.model.enhance(variables, warm_wav[None], **SAMPLER)  # warm it
        f_cold = enh.submit(cold_wav)
        _time.sleep(0.05)  # let the cold batch dispatch first
        f_warm = enh.submit(warm_wav)
        # The warm request completes while the cold one is still stalled.
        out = f_warm.result(timeout=60)
        assert np.all(np.isfinite(out))
        assert not f_cold.done(), "cold batch should still be stalled"
        stall.set()
        assert np.all(np.isfinite(f_cold.result(timeout=60)))
    s = enh.stats()
    assert s["errors"] == 0 and s["batches"] == 2


def test_closed_enhancer_rejects_submits(model_and_params):
    model, variables = model_and_params
    enh = make_enhancer(model, variables)
    enh.close()
    with pytest.raises(RuntimeError):
        enh.submit(np.zeros(1600, np.float32))


def test_admission_control_rejects_when_queue_full(model_and_params):
    """max_pending caps the queue: overload degrades into fast QueueFullError
    (HTTP 503 in cli/serve.py) instead of unbounded queueing delay."""
    from sgmse_tpu.serve import QueueFullError
    model, variables = model_and_params
    rng = np.random.default_rng(5)
    wav = rng.standard_normal(1600).astype(np.float32) * 0.1
    # Long max_delay: the dispatcher sits collecting batch-mates, so submits
    # stack up deterministically past the cap.
    with make_enhancer(model, variables, max_delay_ms=2000.0,
                       max_pending=2) as enh:
        futs = [enh.submit(wav), enh.submit(wav)]
        with pytest.raises(QueueFullError):
            enh.submit(wav)
        assert enh.stats()["rejected"] == 1
        for f in futs:
            assert np.all(np.isfinite(f.result(timeout=300)))


def test_http_server_roundtrip(model_and_params):
    """POST a WAV -> enhanced WAV back; /healthz and /stats respond."""
    from cli.serve import make_handler
    from sgmse_tpu.data.wav import read_wav, write_wav

    model, variables = model_and_params
    rng = np.random.default_rng(3)
    wav = rng.standard_normal(1800).astype(np.float32) * 0.1

    with make_enhancer(model, variables, max_delay_ms=20.0) as enh:
        server = ThreadingHTTPServer(("127.0.0.1", 0),
                                     make_handler(enh, target_sr=16000))
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
                assert json.load(r)["status"] == "ok"

            buf = io.BytesIO()
            write_wav(buf, wav, 16000)
            req = urllib.request.Request(f"http://127.0.0.1:{port}/enhance",
                                         data=buf.getvalue(), method="POST")
            with urllib.request.urlopen(req, timeout=300) as r:
                assert r.headers["Content-Type"] == "audio/wav"
                out, sr = read_wav(io.BytesIO(r.read()))
            assert sr == 16000
            assert out.shape == (1, 1800)
            assert np.all(np.isfinite(out))

            # Malformed body -> 400, not a crash
            req = urllib.request.Request(f"http://127.0.0.1:{port}/enhance",
                                         data=b"not a wav", method="POST")
            with pytest.raises(urllib.error.HTTPError) as exc_info:
                urllib.request.urlopen(req, timeout=30)
            assert exc_info.value.code == 400

            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats", timeout=30) as r:
                stats = json.load(r)
            assert stats["requests"] >= 1
        finally:
            server.shutdown()
            t.join(timeout=10)
