"""CLI end-to-end tests: drive the real entry points as subprocesses
(the reference's `example.sh` smoke flow, SURVEY §4)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(module, args, cwd):
    cmd = [sys.executable, "-m", module, "--platform", "cpu"] + args
    return subprocess.run(
        cmd, capture_output=True, text=True, timeout=240,
        cwd=cwd, env={**os.environ, "PYTHONPATH": REPO + os.pathsep +
                      os.environ.get("PYTHONPATH", "")},
    )


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cliwork"))


def test_train_then_explain_cli(workdir):
    out = run_cli(
        "tpugraph.cli.train",
        ["--dataset", "syn1", "--epochs", "400", "--eval-every", "400"],
        workdir,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout[out.stdout.index("{"):])
    assert summary["result_test"]["acc"] > 0.7
    assert os.path.isdir(os.path.join(workdir, "ckpt", "syn1_base_h20_o20"))
    # TB event file written
    evs = [f for f in os.listdir(os.path.join(workdir, "log",
                                              "syn1_base_h20_o20"))
           if f.startswith("events.out")]
    assert evs

    out = run_cli(
        "tpugraph.cli.explain",
        ["--dataset", "syn1", "--explain-node", "305"],
        workdir,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout[out.stdout.index("{"):])
    assert summary["mask_shape"][0] == summary["mask_shape"][1]
    npys = [f for f in os.listdir(
        os.path.join(workdir, "log", "syn1_base_h20_o20_explain"))
        if f.endswith(".npy")]
    assert npys


def test_train_resume_cli(workdir):
    # depends on the checkpoint from the previous test
    out = run_cli(
        "tpugraph.cli.train",
        ["--dataset", "syn1", "--epochs", "50", "--eval-every", "50",
         "--resume"],
        workdir,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout[out.stdout.index("{"):])
    # resumed model should stay at/above the previous accuracy range
    assert summary["result_train"]["acc"] > 0.7


def test_explain_missing_checkpoint_message(tmp_path):
    out = run_cli(
        "tpugraph.cli.explain", ["--dataset", "syn3"], str(tmp_path)
    )
    assert out.returncode != 0
    assert "train a model" in out.stderr


def test_bcsr_format_flag_reaches_train_config():
    """--bcsr-format plumbs through Config into TrainConfig (the packet
    product path is CLI-reachable, VERDICT r3 item 8)."""
    from tpugraph.cli.config import parse_train_args
    from tpugraph.cli.tasks import train_config

    cfg = parse_train_args(
        ["--dataset", "syn1", "--bcsr", "--bcsr-format", "packets"]
    )
    assert cfg.bcsr_format == "packets"
    tc = train_config(cfg)
    assert tc.bcsr_format == "packets" and tc.use_bcsr


def test_train_halo_cli(workdir):
    """--halo N routes node training through the mesh-sharded halo path
    (VERDICT r4 item 5): trains on the virtual mesh and reaches the same
    accuracy regime as the single-device path."""
    out = run_cli(
        "tpugraph.cli.train",
        ["--dataset", "syn1", "--epochs", "300", "--eval-every", "100",
         "--halo", "4", "--name-suffix", "halo"],
        workdir,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout[out.stdout.index("{"):])
    assert summary["result_test"]["acc"] > 0.7, summary["result_test"]
    assert os.path.isdir(
        os.path.join(workdir, "ckpt", "syn1_base_h20_o20_halo"))


def test_explain_mesh_cli(workdir):
    """--mesh N shards explainer queries over the virtual mesh
    (VERDICT r4 item 5); depends on the checkpoint from
    test_train_then_explain_cli."""
    out = run_cli(
        "tpugraph.cli.explain",
        ["--dataset", "syn1", "--explain-node", "305", "--mesh", "4"],
        workdir,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout[out.stdout.index("{"):])
    assert summary["mesh_devices"] == 4
    assert summary["mask_shape"][0] == summary["mask_shape"][1]
