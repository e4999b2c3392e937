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

Prints one JSON line per offered rate:
  {"offered_rps": r, "sent": n, "ok": n, "p50_ms": ..., "p95_ms": ...,
   "p99_ms": ..., "mean_ms": ..., "throughput_rps": ...}
"""
import argparse
import json
import threading
import time
import urllib.request
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


def run_rate(url: str, body: bytes, rate: float, duration: float,
             timeout: float) -> dict:
    n = max(1, int(rate * duration))
    results = [None] * n
    threads = []

    def worker(i):
        results[i] = fire(url, body, timeout)

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
    n_ok = len(lat)

    def pct(p):
        return round(lat[min(n_ok - 1, int(p * n_ok))], 1) if n_ok else None

    return {
        "offered_rps": rate, "sent": n, "ok": n_ok,
        "p50_ms": pct(0.50), "p95_ms": pct(0.95), "p99_ms": pct(0.99),
        "mean_ms": round(sum(lat) / n_ok, 1) if n_ok else None,
        "throughput_rps": round(n_ok / wall, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", type=str, default="http://127.0.0.1:8731")
    ap.add_argument("--wav", type=str, required=True)
    ap.add_argument("--rates", type=float, nargs="+", default=[0.5, 1, 2, 4])
    ap.add_argument("--duration", type=float, default=30.0,
                    help="Seconds of offered load per rate point.")
    ap.add_argument("--timeout", type=float, default=120.0)
    ap.add_argument("--warm", type=int, default=2,
                    help="Warm-up requests before the measured window.")
    args = ap.parse_args()

    body = Path(args.wav).read_bytes()
    for _ in range(args.warm):
        fire(args.url, body, args.timeout)
    for rate in args.rates:
        print(json.dumps(run_rate(args.url, body, rate, args.duration,
                                  args.timeout)), flush=True)


if __name__ == "__main__":
    main()
