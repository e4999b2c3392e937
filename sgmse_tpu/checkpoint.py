"""Checkpointing: Orbax-backed save/load with embedded hyperparameters, plus the
reference's four checkpoint policies.

Capability parity with reference C34 (train.py:88-97, model.py:87/100-109,
enhancement.py:34):
- hparams are embedded in every checkpoint (config.json sidecar), so
  ``load_score_model(path)`` reconstructs backbone + SDE + DSP with no external
  config — the analogue of ``ScoreModel.load_from_checkpoint``.
- EMA parameters are first-class state (saved alongside train params and used
  for eval, reference model.py:100-125).
- Policies: save_last, every-N-steps keep-all, best-PESQ, best-SI-SDR
  (reference train.py:88-97).
"""
from __future__ import annotations

import json
import os
import shutil
import warnings
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_saveable(tree):
    return jax.tree.map(np.asarray, tree)


def _make_checkpointer():
    """Checkpointer whose barriers never span processes.

    In a multi-process runtime the default StandardCheckpointer participates
    in GLOBAL barriers on save/restore — a save gated to process 0 (our
    single-writer design: params are replicated, so its copy IS the global
    state) would deadlock waiting for peers that never call save. A singleton
    active-process group makes save/restore process-local: any process can
    independently write (rank-0 gating lives in the Trainer) or read (every
    process restores the same files on resume).
    """
    if jax.process_count() > 1:
        pid = jax.process_index()
        opts = ocp.options.MultiprocessingOptions(
            primary_host=pid, active_processes={pid},
            barrier_sync_key_prefix=f"sgmse_proc{pid}")
        return ocp.Checkpointer(ocp.StandardCheckpointHandler(),
                                multiprocessing_options=opts)
    return ocp.StandardCheckpointer()


def save_checkpoint(path: os.PathLike, state_tree: Dict[str, Any],
                    config: Dict[str, Any]) -> None:
    """Save a state pytree + config dict to `path` (a directory), atomically.

    The write goes to a `.tmp` sibling first and is moved into place only
    once complete, so a crash mid-save can never destroy the previous
    checkpoint at `path` — the artifact crash-recovery depends on (the
    reference relies on Lightning's same atomic-replace behavior).
    """
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.parent / (path.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    ckptr = _make_checkpointer()
    ckptr.save(str(tmp), _to_saveable(state_tree))
    if hasattr(ckptr, "wait_until_finished"):
        ckptr.wait_until_finished()
    with open(tmp / "config.json", "w") as f:
        json.dump(config, f, indent=2, default=str)
    # Atomic-enough replace: the old checkpoint disappears only after the new
    # one is fully on disk (os.replace cannot swap non-empty dirs portably,
    # so delete-then-rename; the completed tmp dir survives a crash between
    # the two and is trivially recoverable by hand).
    if path.exists():
        shutil.rmtree(path)
    os.rename(tmp, path)


def load_checkpoint(path: os.PathLike, target: Optional[Any] = None
                    ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load (state_tree, config) from a checkpoint directory."""
    path = Path(path).absolute()
    with open(path / "config.json") as f:
        config = json.load(f)
    ckptr = _make_checkpointer()
    if target is not None:
        state = ckptr.restore(str(path), target)
    else:
        # Target-less restore is how load_score_model rebuilds from config
        # alone (the topology comes from the embedded config, so orbax's
        # "UNSAFE without a target tree" caution does not apply); silence it.
        import logging
        absl_logger = logging.getLogger("absl")
        prev = absl_logger.level
        absl_logger.setLevel(logging.ERROR)
        try:
            state = ckptr.restore(str(path))
        finally:
            absl_logger.setLevel(prev)
    return state, config


def load_score_model(path: os.PathLike):
    """Rebuild a ScoreModel + its EMA variables from an embedded-config checkpoint.

    Analogue of ``ScoreModel.load_from_checkpoint`` (reference enhancement.py:34):
    returns ``(model, variables)`` where variables holds the EMA weights (the
    reference swaps EMA weights in for eval, model.py:111-125).
    """
    from .model import ScoreModel  # local import to avoid cycle

    state, config = load_checkpoint(path)
    model = ScoreModel.from_config(config)
    params = state.get("ema_params")
    if params is None:
        params = state["params"]
    variables = {"params": params}
    variables.update(state.get("model_state", {}))
    return model, variables


class CheckpointPolicies:
    """The reference's four checkpoint callbacks as one policy object.

    - 'last'        : overwritten at every validation epoch (save_last)
    - 'step_<n>'    : kept forever, every `save_ckpt_interval` steps
    - 'best_pesq'   : overwritten when the monitored PESQ improves (mode max)
    - 'best_si_sdr' : overwritten when the monitored SI-SDR improves (mode max)
    """

    def __init__(self, log_dir: os.PathLike, save_ckpt_interval: int = 50000,
                 monitor_metrics: bool = True):
        self.log_dir = Path(log_dir)
        self.save_ckpt_interval = save_ckpt_interval
        self.monitor_metrics = monitor_metrics
        self.best = {"pesq": -np.inf, "si_sdr": -np.inf}
        self._last_interval_step: Optional[int] = None

    def start_from(self, step: int) -> None:
        """Prime the interval baseline with the run's starting step (call on
        (re)start, before the first on_train_step). Without this, a multiple
        crossed INSIDE the first multi-step execution after a resume — e.g.
        resume at 49,995, first call at 50,005 with interval 50,000 — would
        compare against step-1 and silently miss the save."""
        self._last_interval_step = step

    def on_train_step(self, step: int, state_tree, config) -> None:
        """Save a kept-forever checkpoint whenever an interval multiple was
        crossed since the previous call. With multi-step execution
        (Trainer steps_per_execution > 1) the step counter advances in
        jumps, so the exact-multiple test would silently skip intervals."""
        if not self.save_ckpt_interval or step <= 0:
            return
        prev = self._last_interval_step if self._last_interval_step is not None \
            else step - 1
        self._last_interval_step = step
        if step // self.save_ckpt_interval > prev // self.save_ckpt_interval:
            # Name the directory after the crossed interval multiple (the
            # reference's step_{k*interval} convention), not the post-jump
            # step: with steps_per_execution > 1 the counter lands past the
            # multiple (e.g. 50,005 for interval 50,000).
            named = (step // self.save_ckpt_interval) * self.save_ckpt_interval
            save_checkpoint(self.log_dir / f"step_{named}", state_tree, config)

    def on_validation(self, step: int, state_tree, config,
                      metrics: Dict[str, float]) -> None:
        save_checkpoint(self.log_dir / "last", state_tree, config)
        if not self.monitor_metrics:
            return
        for name, key in (("pesq", "pesq"), ("si_sdr", "si_sdr")):
            value = metrics.get(key)
            if value is not None and not np.isfinite(value):
                # A silent skip here means best_<name>/ never materializes and
                # the user never learns why (e.g. PESQ metric unavailable).
                if not getattr(self, f"_warned_{name}", False):
                    setattr(self, f"_warned_{name}", True)
                    warnings.warn(
                        f"validation metric '{key}' is non-finite ({value}); "
                        f"the best_{name} checkpoint policy will not fire. "
                        "If this is PESQ, the P.862 scorer may be unavailable "
                        "(see sgmse_tpu/utils/metrics.py pesq_wb).")
                continue
            if value is not None and value > self.best[name]:
                self.best[name] = value
                save_checkpoint(self.log_dir / f"best_{name}", state_tree, config)
