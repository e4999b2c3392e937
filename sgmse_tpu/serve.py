"""Production serving: dynamic batching of enhancement requests on one chip.

The reference stops at an offline batch CLI (enhancement.py). This module is
the TPU-native serving layer on top of the same `ScoreModel.enhance` pipeline:
concurrent callers submit waveforms of arbitrary length and a single
dispatcher thread groups them into batches that map onto a SMALL, FIXED set of
compiled XLA programs.

TPU-first design constraints (why this isn't just a thread pool):

- **Static shapes.** jit caches one executable per input shape; an arbitrary
  (batch, length) stream would compile endlessly (~60 s per program on a
  remote-compile backend). Requests are therefore bucketed by padded frame
  count (multiples of 64 frames, the same `pad_spec` granularity the model
  pads to anyway — reference util/other.py:76-90) and batches are padded UP
  to a power-of-two row count, so a bucket needs at most log2(max_batch)+1
  executables, all of which can be compiled at startup (`warmup`).
- **One dispatcher, several executors.** A single dispatcher thread owns
  batch composition (deterministic grouping, no device-handle races), but
  each composed batch is EXECUTED on a small thread pool: launching a
  not-yet-compiled (bucket, batch) program stalls for ~60 s on a
  remote-compile backend, and with in-dispatcher execution that stall would
  block dispatch of every already-warm bucket behind it (round-5 regression
  test: test_serve.py::test_cold_bucket_does_not_block_warm_bucket). Warm
  programs dispatch asynchronously, so pool threads do not serialize on the
  device — only on compiles.
- **Bounded latency.** A batch launches when it is full OR when its oldest
  request has waited `max_delay_ms` — the classic throughput/latency knob.
- **Unbounded input length.** Requests longer than the largest bucket run
  individually through `enhance_long`'s chunked overlap-add, whose program
  shapes are constant in utterance length.

Sampling noise is drawn per dispatched batch (key = fold_in(base, batch
counter)): a request's exact output depends on which batch it landed in, as
in any dynamically-batched stochastic service. Set max_batch=1 for
batch-independent outputs.
"""
from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _ceil64(frames: int) -> int:
    return -(-frames // 64) * 64


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class QueueFullError(RuntimeError):
    """Raised by submit() when the pending queue exceeds max_pending —
    admission control so saturating open-loop load degrades into fast 503s
    instead of unbounded queueing delay (measured: >60 s p50 at 1.7x
    capacity without it, docs/PERFORMANCE.md serving table)."""


class _Request:
    __slots__ = ("wav", "future", "t_submit", "bucket")

    def __init__(self, wav, future, bucket):
        self.wav = wav
        self.future = future
        self.t_submit = time.time()
        self.bucket = bucket


class BatchingEnhancer:
    """Dynamic-batching front end over `ScoreModel.enhance`.

    Args:
        model: a ScoreModel.
        variables: its parameter variables (e.g. EMA params from a checkpoint).
        max_batch: largest batch per program launch (the bench knee is 16).
        max_delay_ms: max time a request waits for batch-mates before its
            batch launches anyway.
        max_seconds: requests longer than this route through `enhance_long`
            (chunked overlap-add) as single-utterance work items.
        sampler_kwargs: forwarded to `enhance` (N, predictor, snr, ...).
        pad_mode: spec padding mode (backbone-dependent, see
            `utils.inference.target_sr_and_pad`).
        seed: base RNG seed; batch i samples with fold_in(key(seed), i).
        max_pending: admission-control cap — submit() raises QueueFullError
            when this many requests are already queued (None = unbounded).
    """

    def __init__(self, model, variables, *, max_batch: int = 8,
                 max_delay_ms: float = 100.0, max_seconds: float = 30.0,
                 sampler_kwargs: Optional[Dict[str, Any]] = None,
                 pad_mode: str = "zero_pad", seed: int = 0,
                 chunk_seconds: float = 10.0,
                 max_pending: Optional[int] = None,
                 execute_workers: int = 4):
        self.model = model
        self.variables = variables
        self.max_batch = int(max_batch)
        self.max_delay = float(max_delay_ms) / 1000.0
        self.sampler_kwargs = dict(sampler_kwargs or {})
        self.pad_mode = pad_mode
        self.chunk_seconds = float(chunk_seconds)
        self.max_pending = None if max_pending is None else int(max_pending)
        hop = model.spec.hop_length
        self.hop = hop
        self.max_frames = _ceil64(1 + int(max_seconds * model.sr) // hop)

        self._cond = threading.Condition()
        self._queues: Dict[int, deque] = {}  # bucket frames -> deque[_Request]
        self._stop = False
        self._base_key = jax.random.key(seed)
        self._batch_counter = 0
        self._stats = {"requests": 0, "batches": 0, "batched_rows": 0,
                       "long_requests": 0, "errors": 0, "rejected": 0,
                       "wait_s_sum": 0.0}
        # Batch EXECUTION pool: a cold (bucket, batch) program's compile
        # stall must not block dispatch of warm buckets (see module doc).
        self._executor = ThreadPoolExecutor(
            max_workers=max(1, int(execute_workers)),
            thread_name_prefix="sgmse-serve-exec")
        self._dispatcher = threading.Thread(target=self._run, daemon=True,
                                            name="sgmse-serve-dispatcher")
        self._dispatcher.start()

    # --- client API ------------------------------------------------------------------

    def bucket_for(self, num_samples: int) -> Optional[int]:
        """Padded-frame bucket for an utterance, or None -> enhance_long path."""
        frames = _ceil64(1 + num_samples // self.hop)
        return frames if frames <= self.max_frames else None

    def samples_for_bucket(self, frames: int) -> int:
        """Waveform length that produces exactly `frames` STFT frames."""
        return (frames - 1) * self.hop

    def submit(self, wav: np.ndarray) -> Future:
        """Enqueue a 1-D float waveform (model sample rate); returns a Future
        resolving to the enhanced waveform trimmed to the input length."""
        wav = np.asarray(wav, np.float32)
        if wav.ndim != 1:
            raise ValueError(f"submit() takes a 1-D waveform, got {wav.shape}")
        fut: Future = Future()
        req = _Request(wav, fut, self.bucket_for(len(wav)))
        with self._cond:
            if self._stop:
                raise RuntimeError("BatchingEnhancer is closed")
            if self.max_pending is not None:
                pending = sum(len(q) for q in self._queues.values())
                if pending >= self.max_pending:
                    self._stats["rejected"] += 1
                    raise QueueFullError(
                        f"{pending} requests pending (max_pending="
                        f"{self.max_pending}); retry later")
            self._queues.setdefault(req.bucket, deque()).append(req)
            self._stats["requests"] += 1
            self._cond.notify()
        return fut

    def enhance(self, wav: np.ndarray, timeout: Optional[float] = None) -> np.ndarray:
        """Blocking convenience wrapper around submit()."""
        return self.submit(wav).result(timeout)

    def warmup(self, buckets: List[int], batch_sizes: Optional[List[int]] = None
               ) -> None:
        """Compile the (bucket, batch) programs before serving traffic.

        Defaults to all power-of-two batch sizes up to max_batch — every
        program the dispatcher can ever launch for these buckets (the
        persistent compile cache makes warm restarts cheap).
        """
        if batch_sizes is None:
            batch_sizes = []
            b = 1
            while b <= self.max_batch:
                batch_sizes.append(b)
                b *= 2
        key = jax.random.key(0)
        for frames in buckets:
            n = self.samples_for_bucket(int(frames))
            for b in batch_sizes:
                y = np.zeros((b, n), np.float32)
                self.model.enhance(self.variables, y, key=key,
                                   pad_mode=self.pad_mode, **self.sampler_kwargs)

    def stats(self) -> Dict[str, Any]:
        with self._cond:
            s = dict(self._stats)
            s["pending"] = sum(len(q) for q in self._queues.values())
        if s["batches"]:
            s["mean_wait_ms"] = 1000.0 * s["wait_s_sum"] / max(1, s["batched_rows"]
                                                               + s["long_requests"])
            s["mean_batch_fill"] = s["batched_rows"] / s["batches"]
        return s

    def close(self, timeout: float = 30.0) -> None:
        """Drain pending work and stop the dispatcher."""
        with self._cond:
            self._stop = True
            self._cond.notify_all()
        self._dispatcher.join(timeout)
        self._executor.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # --- dispatcher ------------------------------------------------------------------

    def _pick_batch(self, now: float):
        """Under the lock: choose work to launch, or the next deadline.

        Returns (requests, None) when a batch is ready, (None, wait_s) when
        the dispatcher should sleep, (None, None) when idle-and-stopping.
        """
        best_deadline = None
        for frames, q in self._queues.items():
            if not q:
                continue
            if len(q) >= self.max_batch or frames is None or self._stop:
                # Full batch launches immediately; enhance_long items and
                # drain-on-close never wait for batch-mates.
                take = 1 if frames is None else min(len(q), self.max_batch)
                return [q.popleft() for _ in range(take)], None
            deadline = q[0].t_submit + self.max_delay
            if deadline <= now:
                take = min(len(q), self.max_batch)
                return [q.popleft() for _ in range(take)], None
            if best_deadline is None or deadline < best_deadline:
                best_deadline = deadline
        if best_deadline is not None:
            return None, best_deadline - now
        return None, None

    def _run(self):
        while True:
            with self._cond:
                reqs, wait = self._pick_batch(time.time())
                while reqs is None:
                    if self._stop and wait is None:
                        return
                    self._cond.wait(timeout=wait)
                    reqs, wait = self._pick_batch(time.time())
                key = jax.random.fold_in(self._base_key, self._batch_counter)
                self._batch_counter += 1
            # Execute off-thread: dispatch continues while this batch runs
            # (or, for a cold bucket, while its program compiles).
            self._executor.submit(self._execute_safe, reqs, key)

    def _execute_safe(self, reqs: List[_Request], key):
        try:
            self._execute(reqs, key)
        except Exception as e:  # noqa: BLE001 — failures belong to callers
            with self._cond:
                self._stats["errors"] += len(reqs)
            for r in reqs:
                if not r.future.done():
                    r.future.set_exception(e)

    def _execute(self, reqs: List[_Request], key):
        now = time.time()
        if reqs[0].bucket is None:
            (req,) = reqs
            out = self.model.enhance_long(
                self.variables, req.wav, chunk_seconds=self.chunk_seconds,
                key=key, pad_mode=self.pad_mode, **self.sampler_kwargs)
            with self._cond:
                self._stats["long_requests"] += 1
                self._stats["batches"] += 1
                self._stats["wait_s_sum"] += now - req.t_submit
            req.future.set_result(np.asarray(out[: len(req.wav)]))
            return
        # Pad rows to the next power of two: one executable per (bucket,
        # pow2-batch) instead of one per observed batch size.
        rows = _next_pow2(len(reqs))
        n = self.samples_for_bucket(reqs[0].bucket)
        yb = np.zeros((rows, n), np.float32)
        for i, r in enumerate(reqs):
            yb[i, : len(r.wav)] = r.wav[:n]
        x_hat = np.asarray(self.model.enhance(
            self.variables, yb, key=key, pad_mode=self.pad_mode,
            **self.sampler_kwargs))
        with self._cond:
            self._stats["batches"] += 1
            self._stats["batched_rows"] += len(reqs)
            self._stats["wait_s_sum"] += sum(now - r.t_submit for r in reqs)
        for i, r in enumerate(reqs):
            r.future.set_result(x_hat[i, : len(r.wav)])
