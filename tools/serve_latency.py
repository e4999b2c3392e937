#!/usr/bin/env python
"""Replay a request trace against a running `cli/serve.py` instance and
report latency percentiles vs offered load (VERDICT r3 item 7 — on-chip
serving evidence for docs/PERFORMANCE.md).

Open-loop load generation: requests are fired on a Poisson-ish fixed-rate
schedule from a thread pool (arrival times do NOT wait for completions, so
queueing delay is measured honestly), each POSTing a WAV body to /enhance.

Usage:
  python tools/serve_latency.py --url http://127.0.0.1:8731 \
      --wav /tmp/verify_ds/test/noisy/utt0.wav --rates 0.5 1 2 4 --duration 30

Mixed-length replay (VERDICT r4 item 10): pass several --wav files (e.g.
0.5 s to 20 s utterances); requests cycle through them deterministically and
the report is broken out PER padded-frame BUCKET, so cross-bucket
interference (a cold/slow bucket stalling a warm one) is visible directly:

  python tools/serve_latency.py --url ... --wav a.wav b.wav c.wav \
      --rates 1 2 --duration 30

Prints one JSON line per offered rate:
  {"offered_rps": r, "sent": n, "ok": n, "p50_ms": ..., "p95_ms": ...,
   "p99_ms": ..., "mean_ms": ..., "throughput_rps": ...,
   "per_bucket": {"<seconds>s": {"sent": ..., "ok": ..., "p50_ms": ...,
                                 "p95_ms": ...}, ...}}   # multi-wav only
"""
import argparse
import json
import threading
import time
import urllib.request
import wave
from pathlib import Path


def fire(url: str, body: bytes, timeout: float):
    t0 = time.perf_counter()
    try:
        req = urllib.request.Request(url + "/enhance", data=body,
                                     headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            ok = resp.status == 200 and len(resp.read()) > 44
    except Exception:
        ok = False
    return ok, (time.perf_counter() - t0) * 1000.0


def _wav_seconds(path: str) -> float:
    with wave.open(path, "rb") as w:
        return w.getnframes() / w.getframerate()


def _pcts(lat):
    n_ok = len(lat)

    def pct(p):
        return round(lat[min(n_ok - 1, int(p * n_ok))], 1) if n_ok else None

    return pct


def run_rate(url: str, bodies, labels, rate: float, duration: float,
             timeout: float) -> dict:
    n = max(1, int(rate * duration))
    results = [None] * n
    threads = []

    def worker(i):
        results[i] = fire(url, bodies[i % len(bodies)], timeout)

    t_start = time.perf_counter()
    for i in range(n):
        target = t_start + i / rate
        delay = target - time.perf_counter()
        if delay > 0:
            time.sleep(delay)
        th = threading.Thread(target=worker, args=(i,), daemon=True)
        th.start()
        threads.append(th)
    for th in threads:
        th.join(timeout=timeout + 10)
    wall = time.perf_counter() - t_start

    lat = sorted(ms for r in results if r for ok, ms in [r] if ok)
    pct = _pcts(lat)
    out = {
        "offered_rps": rate, "sent": n, "ok": len(lat),
        "p50_ms": pct(0.50), "p95_ms": pct(0.95), "p99_ms": pct(0.99),
        "mean_ms": round(sum(lat) / len(lat), 1) if lat else None,
        "throughput_rps": round(len(lat) / wall, 3),
    }
    if len(bodies) > 1:
        per = {}
        for j, label in enumerate(labels):
            sub = [results[i] for i in range(n) if i % len(bodies) == j]
            ls = sorted(ms for r in sub if r for ok, ms in [r] if ok)
            p = _pcts(ls)
            per[label] = {"sent": len(sub), "ok": len(ls),
                          "p50_ms": p(0.50), "p95_ms": p(0.95)}
        out["per_bucket"] = per
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", type=str, default="http://127.0.0.1:8731")
    ap.add_argument("--wav", type=str, nargs="+", required=True,
                    help="One or more WAVs; several = mixed-length replay "
                         "with per-bucket reporting.")
    ap.add_argument("--rates", type=float, nargs="+", default=[0.5, 1, 2, 4])
    ap.add_argument("--duration", type=float, default=30.0,
                    help="Seconds of offered load per rate point.")
    ap.add_argument("--timeout", type=float, default=120.0)
    ap.add_argument("--warm", type=int, default=2,
                    help="Warm-up requests (per wav) before the measured window.")
    args = ap.parse_args()

    bodies = [Path(w).read_bytes() for w in args.wav]
    labels = [f"{_wav_seconds(w):.1f}s" for w in args.wav]
    for _ in range(args.warm):
        for body in bodies:
            fire(args.url, body, args.timeout)
    for rate in args.rates:
        print(json.dumps(run_rate(args.url, bodies, labels, rate,
                                  args.duration, args.timeout)), flush=True)


if __name__ == "__main__":
    main()
