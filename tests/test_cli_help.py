"""`--help` must render for every CLI and every dynamic flag combination.

Regression for a real user-facing crash found in round 4: an argparse help
string containing a bare ``%`` ("~30% more FLOPs") made
``python cli/train.py --help`` die with ``ValueError: unsupported format
character`` — argparse expands ``help % params`` when printing
(reference train.py:30-66 is the dynamic-flag surface being exercised).

These tests format the composed help text in-process (no subprocess): the
format step is exactly what ``--help`` runs, so a bad ``%`` in any
``add_argparse_args`` group fails here.
"""
import argparse

import pytest

from sgmse_tpu.data.dataset import SpecsDataModule
from sgmse_tpu.model import ScoreModel
from sgmse_tpu.models import BackboneRegistry
from sgmse_tpu.sdes import SDERegistry


def _format_all_groups(backbone: str, sde: str) -> str:
    parser = argparse.ArgumentParser(prog="train.py")
    ScoreModel.add_argparse_args(parser.add_argument_group("ScoreModel"))
    SDERegistry.get_by_name(sde).add_argparse_args(
        parser.add_argument_group("SDE"))
    BackboneRegistry.get_by_name(backbone).add_argparse_args(
        parser.add_argument_group("Backbone"))
    SpecsDataModule.add_argparse_args(parser.add_argument_group("DataModule"))
    return parser.format_help()


@pytest.mark.parametrize("backbone", BackboneRegistry.get_all_names())
@pytest.mark.parametrize("sde", SDERegistry.get_all_names())
def test_help_renders_for_every_dynamic_flag_combo(backbone, sde):
    text = _format_all_groups(backbone, sde)
    assert "--lr" in text and "--batch_size" in text


@pytest.mark.parametrize("cli,flag", [
    ("enhance.py", "--corrector"),
    ("calc_metrics.py", "--enhanced_dir"),
    ("train.py", "--backbone"),
    ("serve.py", "--port"),
])
def test_cli_help_subprocess(cli, flag):
    """Run each CLI's ACTUAL --help in a subprocess: a bad ``%`` (or any
    parser-construction crash) in the real cli/*.py files fails here, which
    the in-process reconstruction above cannot catch."""
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parent.parent
    res = subprocess.run([sys.executable, str(repo / "cli" / cli), "--help"],
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert flag in res.stdout
