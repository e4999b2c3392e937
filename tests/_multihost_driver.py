"""Subprocess driver for the 2-process multi-host training test.

Launched by tests/test_multihost.py with:
    python tests/_multihost_driver.py <process_id> <num_processes> <port> \
        <base_dir> <log_dir> <out_json>

Forces the CPU platform (the environment's sitecustomize pre-imports jax with
the axon TPU platform), joins the JAX coordination service via the SAME
cli/train.py bootstrap flags a real multi-host launch would use, trains a tiny
model for a few steps, and dumps a param checksum + process info for the
parent to assert on.
"""
import json
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    process_id, num_processes, port, base_dir, log_dir, out_json = sys.argv[1:7]

    import numpy as np

    from cli.train import main as train_main

    sys.argv = [
        "train.py",
        "--base_dir", base_dir,
        "--backbone", "ncsnpp", "--sde", "ouve", "--nolog",
        "--coordinator_address", f"localhost:{port}",
        "--num_processes", num_processes,
        "--process_id", process_id,
        "--nf", "16", "--ch_mult", "1", "1", "2", "--num_res_blocks", "1",
        "--n_fft", "126", "--hop_length", "32", "--num_frames", "64",
        "--batch_size", "2", "--num_workers", "1",
        "--num_eval_files", "2", "--N", "5",
        "--max_steps", "2", "--max_epochs", "1",
        "--log_dir", log_dir,
    ]
    state = train_main()

    leaves = jax.tree.leaves(state.params)
    checksum = float(sum(float(np.abs(np.asarray(l)).sum()) for l in leaves))
    with open(out_json, "w") as f:
        json.dump({
            "process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "device_count": jax.device_count(),
            "local_device_count": jax.local_device_count(),
            "param_checksum": checksum,
            "step": int(state.step),
        }, f)


if __name__ == "__main__":
    main()
