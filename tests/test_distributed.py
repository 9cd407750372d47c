"""Multi-host runtime smoke test: two REAL processes join one JAX runtime
via `gan2shape_tpu.parallel.distributed` (the TPU-native replacement for the
reference's broken NCCL/DDP init, reference stylegan2 train.py:436-450) and
run a jitted reduction over a mesh spanning both processes' devices.

Runs on the CPU backend (cross-process collectives ride Gloo; on a TPU pod
the identical code rides ICI/DCN).  The workers live in tests/dist_worker.py
because each needs its own fresh JAX runtime — the in-process backend here is
already initialized single-process.
"""
import os
import socket
import subprocess
import sys

from gan2shape_tpu.parallel import distributed

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_smoke():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "dist_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"DIST_OK process={i} total=28.0" in out, out


def test_initialize_from_env_noop_single_process(monkeypatch):
    """Without coordinates the single-process path is untouched."""
    for var in ("G2S_COORDINATOR", "G2S_NUM_PROCESSES", "G2S_PROCESS_ID",
                "G2S_MULTIHOST", "JAX_COORDINATOR_ADDRESS",
                "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.initialize_from_env() is False


def test_initialize_from_env_partial_spec_fails(monkeypatch):
    """A PARTIAL multi-host spec must fail loudly: silently degrading to
    single-process makes every host train independently, and a defaulted
    process_id=0 hangs the coordinator waiting for the other ranks."""
    import pytest

    for var in ("G2S_COORDINATOR", "G2S_NUM_PROCESSES", "G2S_PROCESS_ID",
                "G2S_MULTIHOST", "JAX_COORDINATOR_ADDRESS",
                "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)

    monkeypatch.setenv("G2S_COORDINATOR", "localhost:1234")
    with pytest.raises(RuntimeError, match="partial multi-host"):
        distributed.initialize_from_env()

    monkeypatch.setenv("G2S_NUM_PROCESSES", "2")  # still no process id
    with pytest.raises(RuntimeError, match="partial multi-host"):
        distributed.initialize_from_env()

    # complete spec with num_processes=1: explicit single-process, no init
    monkeypatch.setenv("G2S_PROCESS_ID", "0")
    monkeypatch.setenv("G2S_NUM_PROCESSES", "1")
    assert distributed.initialize_from_env() is False
