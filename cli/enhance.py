#!/usr/bin/env python
"""Enhancement CLI: load a checkpoint, enhance every wav in a test dir.

Capability parity with /root/reference/enhancement.py:19-103 — same flags, same
backbone-name -> (sample rate, pad mode) dispatch (lines 45-54), same sampler
dispatch on SDE type (lines 79-91), same per-utterance normalization — plus a
TPU-first throughput extension: ``--batch_size`` groups utterances into
equal-padded-length buckets and enhances them batched in one jitted program
(the reference processes one file per sampler launch).
"""
import argparse
import sys
from glob import glob
from os import makedirs
from os.path import dirname, join
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--test_dir", type=str, required=True,
                        help="Directory containing the test data")
    parser.add_argument("--enhanced_dir", type=str, required=True,
                        help="Directory to write the enhanced data")
    parser.add_argument("--ckpt", type=str, required=True, help="Path to model checkpoint")
    parser.add_argument("--sampler_type", type=str, default="pc",
                        help="Sampler type for the PC sampler.")
    parser.add_argument("--corrector", type=str, choices=("ald", "langevin", "none"),
                        default="ald", help="Corrector class for the PC sampler.")
    parser.add_argument("--corrector_steps", type=int, default=1,
                        help="Number of corrector steps")
    parser.add_argument("--snr", type=float, default=0.5,
                        help="SNR value for (annealed) Langevin dynamics")
    parser.add_argument("--N", type=int, default=30, help="Number of reverse steps")
    parser.add_argument("--t_eps", type=float, default=0.03,
                        help="The minimum process time (0.03 by default)")
    parser.add_argument("--batch_size", type=int, default=1,
                        help="Utterances enhanced per device program (bucketed by length)")
    parser.add_argument("--seed", type=int, default=0, help="Sampling RNG seed")
    parser.add_argument("--timeit", action="store_true",
                        help="Print total RTF over the run (excludes jit warmup: "
                             "every program shape the run will use is compiled "
                             "before the clock starts)")
    parser.add_argument("--chunk_seconds", type=float, default=None,
                        help="Enhance long files in overlapping chunks of this "
                             "many seconds (overlap-add crossfade, bounded "
                             "memory for arbitrarily long audio)")
    parser.add_argument("--precision", type=str, default=None,
                        choices=("float32", "bfloat16"),
                        help="Override the checkpoint's compute precision "
                             "(bfloat16 doubles MXU throughput; params stay float32)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="Shard each utterance batch over ALL local devices "
                             "(1-D 'data' mesh; multi-chip inference throughput — "
                             "use with --batch_size >= the device count)")
    args = parser.parse_args()

    import time

    import jax

    from sgmse_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from sgmse_tpu.checkpoint import load_score_model
    from sgmse_tpu.data.wav import read_wav, resample, write_wav
    from sgmse_tpu.dsp import pad_spec

    model, variables = load_score_model(args.ckpt)
    model.t_eps = args.t_eps
    if args.precision is not None:
        # Rebuild the (stateless) model with the requested compute dtype;
        # parameters are float32 either way.
        from sgmse_tpu.model import ScoreModel
        cfg = model.config_dict()
        cfg["precision"] = args.precision
        model = ScoreModel.from_config(cfg)

    noisy_files = []
    noisy_files += sorted(glob(join(args.test_dir, "*.wav")))
    noisy_files += sorted(glob(join(args.test_dir, "**", "*.wav")))
    noisy_files += sorted(glob(join(args.test_dir, "*.flac")))
    noisy_files += sorted(glob(join(args.test_dir, "**", "*.flac")))

    # Backbone-name dispatch (reference enhancement.py:45-54).
    from sgmse_tpu.utils.inference import target_sr_and_pad
    target_sr, pad_mode = target_sr_and_pad(model.backbone)

    sampler_kwargs = dict(N=args.N, corrector=args.corrector,
                          corrector_steps=args.corrector_steps, snr=args.snr,
                          pad_mode=pad_mode)
    if args.data_parallel:
        from sgmse_tpu.parallel.mesh import make_data_mesh
        mesh = make_data_mesh()
        sampler_kwargs["mesh"] = mesh
        if args.batch_size < mesh.devices.size:
            print(f"--data_parallel: batch_size {args.batch_size} < "
                  f"{mesh.devices.size} devices — batches are zero-padded up "
                  "to the device count; raise --batch_size for full "
                  "utilization", file=sys.stderr)
    if model.sde_name == "ouve":
        import dataclasses
        model.sde = dataclasses.replace(model.sde, sampler_type=args.sampler_type)
    elif model.sde_name == "sbve":
        # pc silently maps to ode for SB models (reference enhancement.py:88).
        st = "ode" if args.sampler_type == "pc" else args.sampler_type
        import dataclasses
        model.sde = dataclasses.replace(model.sde, sampler_type=st)

    key = jax.random.key(args.seed)

    # Load all files, bucket by padded spectrogram length for batching.
    items = []
    for noisy_file in noisy_files:
        filename = noisy_file.replace(args.test_dir, "")
        filename = filename[1:] if filename.startswith("/") else filename
        if noisy_file.endswith(".flac"):
            try:
                import soundfile as sf
                y, sr = sf.read(noisy_file, dtype="float32")
                y = y.T if y.ndim > 1 else y[None]
            except ImportError:
                print(f"skipping {filename}: flac requires the soundfile package",
                      file=sys.stderr)
                continue
        else:
            y, sr = read_wav(noisy_file)
        y = y[0]
        if sr != target_sr:
            y = resample(y, sr, target_sr)
        items.append((filename, y))

    # Build the batched work plan up front (chunks of <= batch_size utterances
    # whose padded frame count matches, padded to the chunk's longest) so the
    # --timeit warm-up can compile EVERY program shape the timed loop will
    # use — not just the first bucket's.
    chunks = None
    if args.batch_size > 1:
        hop = model.spec.hop_length
        buckets = {}
        for filename, y in items:
            frames = 1 + len(y) // hop
            padded_frames = -(-frames // 64) * 64
            buckets.setdefault(padded_frames, []).append((filename, y))
        chunks = []
        for padded_frames, group in sorted(buckets.items()):
            for i in range(0, len(group), args.batch_size):
                chunks.append(group[i:i + args.batch_size])

    if args.timeit and items:
        # Compile outside the timed region, once per unique program shape.
        # With --chunk_seconds, warm up ONE chunk-sized segment (never the
        # full waveform — the whole point of chunking is to avoid compiling
        # the unbounded-length program; all chunks share one padded shape).
        if args.batch_size <= 1:
            if args.chunk_seconds is not None:
                seg = items[0][1][: int(args.chunk_seconds * target_sr)]
                model.enhance(variables, seg, key=key, **sampler_kwargs)
            else:
                for length in sorted({len(y) for _, y in items}):
                    model.enhance(variables, np.zeros(length, np.float32),
                                  key=key, **sampler_kwargs)
        else:
            for batch, maxlen in sorted({
                    (len(c), max(len(y) for _, y in c)) for c in chunks}):
                model.enhance(variables, np.zeros((batch, maxlen), np.float32),
                              key=key, **sampler_kwargs)

    total_audio_s, t0 = 0.0, time.time()
    if args.batch_size <= 1:
        for filename, y in items:
            key, sub = jax.random.split(key)
            if args.chunk_seconds is not None:
                x_hat = model.enhance_long(variables, y, key=sub,
                                           chunk_seconds=args.chunk_seconds,
                                           **sampler_kwargs)
            else:
                x_hat = model.enhance(variables, y, key=sub, **sampler_kwargs)
            out = join(args.enhanced_dir, filename)
            makedirs(dirname(out), exist_ok=True)
            write_wav(out, x_hat, target_sr)
            total_audio_s += len(y) / target_sr
            print(filename)
    else:
        # Double-buffered: dispatch batch i with sync=False (device array, no
        # host fence), then while it computes, read back and write batch i-1.
        # Overlaps device compute with host readback + wav writes + the next
        # batch's np.stack prep; measured RTF 0.122 -> 0.117 (~4%) at the
        # production config (docs/PERFORMANCE.md round-4 row).
        pending = None  # (chunk, device x_hat)

        def flush(entry):
            nonlocal total_audio_s
            chunk, x_dev = entry
            for (filename, y), xh in zip(chunk, np.asarray(x_dev)):
                out = join(args.enhanced_dir, filename)
                makedirs(dirname(out), exist_ok=True)
                write_wav(out, xh[: len(y)], target_sr)
                total_audio_s += len(y) / target_sr
                print(filename)

        for chunk in chunks:
            maxlen = max(len(y) for _, y in chunk)
            yb = np.stack([np.pad(y, (0, maxlen - len(y))) for _, y in chunk])
            key, sub = jax.random.split(key)
            x_hat = model.enhance(variables, yb, key=sub, sync=False,
                                  **sampler_kwargs)
            if pending is not None:
                flush(pending)
            pending = (chunk, x_hat)
        if pending is not None:
            flush(pending)

    if args.timeit and total_audio_s > 0:
        wall = time.time() - t0
        print(f"RTF: {wall / total_audio_s:.4f} (wall {wall:.1f}s / audio {total_audio_s:.1f}s)")


if __name__ == "__main__":
    main()
