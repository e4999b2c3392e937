#!/usr/bin/env python
"""Training CLI with registry-driven dynamic flags.

Capability parity with /root/reference/train.py:30-110: a throwaway parser
reads --backbone/--sde, then each selected class (plus ScoreModel, Trainer and
the DataModule) contributes its own argparse group; groups are split back into
kwargs and fed to the model (dynamic flag composition, the reference's genuine
CLI capability). Checkpoint callbacks: last / every --save_ckpt_interval steps
/ best-PESQ / best-SI-SDR (reference train.py:88-97).
"""
import argparse
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def maybe_init_distributed(args):
    """Bootstrap JAX multi-process coordination (reference: Lightning spawns
    DDP processes, train.py:104; here each host process is launched externally
    and joins the coordination service).

    Activated by --coordinator_address/--num_processes/--process_id or
    --distributed auto (which lets jax.distributed.initialize() auto-detect a
    TPU pod environment). Must run before any JAX backend is touched.
    """
    import jax

    if args.coordinator_address or args.num_processes is not None:
        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id)
    elif args.distributed == "auto":
        jax.distributed.initialize()


def get_argparse_groups(parser, args):
    groups = {}
    for group in parser._action_groups:
        group_dict = {a.dest: getattr(args, a.dest, None) for a in group._group_actions}
        groups[group.title] = argparse.Namespace(**group_dict)
    return groups


def main():
    from sgmse_tpu.data.dataset import SpecsDataModule
    from sgmse_tpu.model import ScoreModel
    from sgmse_tpu.models import BackboneRegistry
    from sgmse_tpu.sdes import SDERegistry
    from sgmse_tpu.train import Trainer
    from sgmse_tpu.utils.loggers import make_logger

    # Throwaway parser for dynamic args (reference train.py:31-43).
    base_parser = ArgumentParser(add_help=False)
    parser = ArgumentParser()
    for parser_ in (base_parser, parser):
        parser_.add_argument("--backbone", type=str,
                             choices=BackboneRegistry.get_all_names(), default="ncsnpp")
        parser_.add_argument("--sde", type=str,
                             choices=SDERegistry.get_all_names(), default="ouve")
        parser_.add_argument("--nolog", action="store_true", help="Turn off logging.")
        parser_.add_argument("--wandb_name", type=str, default=None,
                             help="Name for wandb logger. If not set, a random name is generated.")
        parser_.add_argument("--ckpt", type=str, default=None,
                             help="Resume training from checkpoint.")
        parser_.add_argument("--log_dir", type=str, default="logs",
                             help="Directory to save logs.")
        parser_.add_argument("--save_ckpt_interval", type=int, default=50000,
                             help="Save checkpoint interval.")
        parser_.add_argument("--distributed", type=str, default="none",
                             choices=("none", "auto"),
                             help="'auto' calls jax.distributed.initialize() with "
                                  "environment auto-detection (TPU pods).")
        parser_.add_argument("--coordinator_address", type=str, default=None,
                             help="host:port of process 0's JAX coordination "
                                  "service (multi-host training).")
        parser_.add_argument("--num_processes", type=int, default=None,
                             help="Total number of host processes (multi-host).")
        parser_.add_argument("--process_id", type=int, default=None,
                             help="This process's index in [0, num_processes).")
    temp_args, _ = base_parser.parse_known_args()
    maybe_init_distributed(temp_args)

    # After distributed init: the cache auto-disables when process_count > 1
    # (asymmetric cache hits across ranks blow the collective-init deadline).
    from sgmse_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    backbone_cls = BackboneRegistry.get_by_name(temp_args.backbone)
    sde_class = SDERegistry.get_by_name(temp_args.sde)

    trainer_parser = parser.add_argument_group("Trainer", description="Trainer")
    trainer_parser.add_argument("--devices", default="auto",
                                help="How many devices to use ('auto' = all).")
    trainer_parser.add_argument("--accumulate_grad_batches", type=int, default=1,
                                help="Accumulate gradients.")
    trainer_parser.add_argument("--max_epochs", type=int, default=-1,
                                help="Number of epochs to train.")
    trainer_parser.add_argument("--max_steps", type=int, default=-1,
                                help="Number of steps to train (-1 = unlimited).")
    trainer_parser.add_argument("--steps_per_execution", type=int, default=1,
                                help="Scan this many train steps inside one "
                                     "jitted program (amortizes per-launch "
                                     "dispatch overhead; TPU-only win).")
    trainer_parser.add_argument("--seed", type=int, default=0,
                                help="Base RNG seed: feeds jax.random.key for "
                                     "init/diffusion-time/noise draws AND the "
                                     "data loader's shuffle+crop generator. "
                                     "Two runs with the same seed produce "
                                     "identical metrics (key-split scheme: "
                                     "docs/DESIGN.md).")

    ScoreModel.add_argparse_args(
        parser.add_argument_group("ScoreModel", description=ScoreModel.__name__))
    sde_class.add_argparse_args(
        parser.add_argument_group("SDE", description=sde_class.__name__))
    backbone_cls.add_argparse_args(
        parser.add_argument_group("Backbone", description=backbone_cls.__name__))
    SpecsDataModule.add_argparse_args(
        parser.add_argument_group("DataModule", description=SpecsDataModule.__name__))

    args = parser.parse_args()
    arg_groups = get_argparse_groups(parser, args)

    model = ScoreModel(
        backbone=args.backbone, sde=args.sde,
        **{
            **vars(arg_groups["ScoreModel"]),
            **vars(arg_groups["SDE"]),
            **vars(arg_groups["Backbone"]),
            **vars(arg_groups["DataModule"]),
        },
    )
    data_module = SpecsDataModule(**vars(arg_groups["DataModule"]), seed=args.seed)
    import jax
    logger = make_logger(args.nolog, args.log_dir, args.wandb_name,
                         is_main=jax.process_index() == 0)
    num_devices = None if args.devices == "auto" else int(args.devices)
    trainer = Trainer(
        model, data_module, logger, log_dir=args.log_dir,
        max_epochs=args.max_epochs, max_steps=args.max_steps,
        accumulate_grad_batches=args.accumulate_grad_batches,
        save_ckpt_interval=args.save_ckpt_interval,
        num_devices=num_devices,
        seed=args.seed,
        steps_per_execution=args.steps_per_execution,
    )
    return trainer.fit(ckpt_path=args.ckpt)


if __name__ == "__main__":
    main()
