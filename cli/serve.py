#!/usr/bin/env python
"""Enhancement server: HTTP front end over the dynamic-batching TPU runtime.

A serving extension beyond the reference's offline CLIs (enhancement.py is
batch-offline only): load a checkpoint once, compile the shape-bucketed
sampler programs once, then serve concurrent enhancement requests with
dynamic batching (`sgmse_tpu.serve.BatchingEnhancer`).

Endpoints (stdlib ThreadingHTTPServer — one OS thread per in-flight request,
all device work funneled through the single dispatcher thread):

  POST /enhance   body: a WAV file. Response: the enhanced WAV (16-bit PCM,
                  model sample rate). Input is mixed down to mono and
                  resampled to the model rate if needed.
  GET  /healthz   {"status": "ok"} once the model is warmed up.
  GET  /stats     live serving counters (batches, fill, mean wait, ...).

Example:
  python cli/serve.py --ckpt logs/0/best_pesq --port 8000 \
      --batch_size 8 --max_delay_ms 100 --warm_seconds 2 4
  curl -s --data-binary @noisy.wav http://localhost:8000/enhance -o enhanced.wav
"""
import argparse
import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_enhancer(args):
    """Load ckpt -> ScoreModel + BatchingEnhancer (shared with tests)."""
    import dataclasses

    from sgmse_tpu.checkpoint import load_score_model
    from sgmse_tpu.model import ScoreModel
    from sgmse_tpu.serve import BatchingEnhancer
    from sgmse_tpu.utils.compile_cache import enable_persistent_cache
    from sgmse_tpu.utils.inference import target_sr_and_pad

    enable_persistent_cache()
    model, variables = load_score_model(args.ckpt)
    if args.precision is not None:
        cfg = model.config_dict()
        cfg["precision"] = args.precision
        model = ScoreModel.from_config(cfg)
    target_sr, pad_mode = target_sr_and_pad(model.backbone)
    if model.sde_name == "sbve" and args.sampler_type == "pc":
        # pc silently maps to ode for SB models (reference enhancement.py:88).
        args.sampler_type = "ode"
    if model.sde_name in ("ouve", "sbve"):
        model.sde = dataclasses.replace(model.sde, sampler_type=args.sampler_type)
    sampler_kwargs = dict(N=args.N, corrector=args.corrector,
                          corrector_steps=args.corrector_steps, snr=args.snr)
    if getattr(args, "data_parallel", False):
        # Shard every batched program over all local devices (model.enhance
        # zero-pads partial batches to the mesh size). Multi-chip serving
        # throughput; the single-chip case is a no-op 1-device mesh.
        from sgmse_tpu.parallel.mesh import make_data_mesh
        sampler_kwargs["mesh"] = make_data_mesh()
    enhancer = BatchingEnhancer(
        model, variables, max_batch=args.batch_size,
        max_delay_ms=args.max_delay_ms, max_seconds=args.max_seconds,
        sampler_kwargs=sampler_kwargs, pad_mode=pad_mode, seed=args.seed,
        chunk_seconds=args.chunk_seconds,
        max_pending=args.max_pending or None)
    return model, enhancer, target_sr


def make_handler(enhancer, target_sr):
    from sgmse_tpu.data.wav import read_wav, resample, write_wav
    from sgmse_tpu.serve import QueueFullError

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok"})
            elif self.path == "/stats":
                self._json(200, enhancer.stats())
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/enhance":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                wav, sr = read_wav(io.BytesIO(self.rfile.read(n)))
                y = wav.mean(axis=0) if wav.shape[0] > 1 else wav[0]
                if sr != target_sr:
                    y = resample(y, sr, target_sr)
            except Exception as e:  # malformed request body
                self._json(400, {"error": f"bad WAV body: {e}"})
                return
            try:
                x_hat = enhancer.enhance(y, timeout=600.0)
                buf = io.BytesIO()
                write_wav(buf, x_hat, target_sr)
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except QueueFullError as e:
                self._json(503, {"error": str(e), "retry": True})
            except Exception as e:
                self._json(500, {"error": str(e)})

        def log_message(self, fmt, *log_args):  # quiet request log -> stderr
            print("serve: " + fmt % log_args, file=sys.stderr)

    return Handler


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True, help="Path to model checkpoint")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--batch_size", type=int, default=8,
                        help="Max utterances per device program launch")
    parser.add_argument("--max_delay_ms", type=float, default=100.0,
                        help="Max time a request waits for batch-mates")
    parser.add_argument("--max_seconds", type=float, default=30.0,
                        help="Longer inputs run via chunked overlap-add")
    parser.add_argument("--max_pending", type=int, default=64,
                        help="Admission control: reject (503) when this many "
                             "requests are queued; 0 = unbounded")
    parser.add_argument("--chunk_seconds", type=float, default=10.0,
                        help="Chunk size for the overlap-add long path")
    parser.add_argument("--warm_seconds", type=float, nargs="*", default=[2.0, 4.0],
                        help="Compile programs for these utterance durations "
                             "(all power-of-2 batch sizes) before serving")
    parser.add_argument("--sampler_type", type=str, default="pc")
    parser.add_argument("--corrector", type=str, default="ald",
                        choices=("ald", "langevin", "none"))
    parser.add_argument("--corrector_steps", type=int, default=1)
    parser.add_argument("--snr", type=float, default=0.5)
    parser.add_argument("--N", type=int, default=30)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--data_parallel", action="store_true",
                        help="Shard batched programs over ALL local devices "
                             "(1-D 'data' mesh; multi-chip serving throughput)")
    parser.add_argument("--precision", type=str, default=None,
                        choices=("float32", "bfloat16"))
    args = parser.parse_args()

    model, enhancer, target_sr = build_enhancer(args)
    if args.warm_seconds:
        buckets = sorted({
            b for s in args.warm_seconds
            if (b := enhancer.bucket_for(int(s * target_sr))) is not None})
        print(f"serve: warming {len(buckets)} bucket(s) {buckets} "
              f"(batch sizes 1..{args.batch_size})...", flush=True)
        enhancer.warmup(buckets)

    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(enhancer, target_sr))
    print(f"serve: ready on http://{args.host}:{args.port} "
          f"(model {model.backbone}/{model.sde_name} @ {target_sr} Hz)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        threading.Thread(target=server.shutdown, daemon=True).start()
        enhancer.close()


if __name__ == "__main__":
    main()
