"""Example-CLI smoke tests (slow): every example must run end-to-end with
tiny settings on the synthetic fallback data. Guards the examples against
API drift between rounds."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=8",
)
ENV.pop("PALLAS_AXON_POOL_IPS", None)


def _run(args, timeout=420):
    return subprocess.run(
        [sys.executable] + args, cwd=ROOT, env=ENV, timeout=timeout,
        capture_output=True, text=True,
    )


@pytest.mark.slow
def test_example_clip():
    r = _run(["examples/clip_train.py", "--epochs", "2", "--batch-size",
              "32", "--embed-dim", "32"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "retrieval@1" in r.stdout


@pytest.mark.slow
def test_example_arxiv():
    r = _run(["examples/arxiv.py", "--epochs", "25"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "test accuracy" in r.stdout


@pytest.mark.slow
def test_example_timemachine():
    r = _run(["examples/timemachine.py", "--epochs", "1", "--generate", "10",
              "--hidden", "64"])
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.slow
def test_example_cifar100():
    r = _run(["examples/cifar100.py", "--epochs", "1", "--batch-size", "64"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "test accuracy" in r.stdout


@pytest.mark.slow
def test_example_cifar100_mesh():
    r = _run(["examples/cifar100.py", "--epochs", "1", "--batch-size", "64",
              "--mesh", "dp=8"])
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.slow
def test_example_cifar100_distributed():
    """The multi-PROCESS example (reference example-cifar100-distributed +
    run_cifar_dist{1,2}.sh): 2 jax.distributed worker processes, rank-
    sharded batches, one SPMD step over the global mesh."""
    env = dict(ENV, PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, "examples/cifar100_distributed.py",
         "--launch-local", "2", "--epochs", "1"],
        cwd=ROOT, env=env, timeout=420, capture_output=True, text=True,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    assert "all 2 workers finished" in r.stdout


@pytest.mark.slow
def test_example_bert():
    r = _run(["examples/bert.py", "--steps", "8", "--layers", "1", "--dim",
              "32", "--batch-size", "8", "--max-length", "64"])
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.slow
def test_example_translation():
    r = _run(["examples/translation.py", "--steps", "30", "--dim", "32",
              "--layers", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "greedy decode" in r.stdout


@pytest.mark.slow
def test_example_extratrees():
    r = _run(["examples/extratrees_mnist.py", "--trees", "5"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "test accuracy" in r.stdout


@pytest.mark.slow
def test_example_lm_train_and_generate(tmp_path):
    corpus = tmp_path / "c.txt"
    corpus.write_text("hello world " * 500)
    ck = str(tmp_path / "ck")
    common = ["--layers", "1", "--dim", "32", "--heads", "2", "--context",
              "32", "--checkpoint", ck]
    r = _run(["examples/autoregressivelm.py", "train", "--corpus",
              str(corpus), "--steps", "4", "--batch-size", "2",
              "--grad-accum", "2"] + common)
    assert r.returncode == 0, r.stderr[-2000:]
    r2 = _run(["examples/autoregressivelm.py", "generate", "--prompt", "he",
               "--length", "8"] + common)
    assert r2.returncode == 0, r2.stderr[-2000:]
