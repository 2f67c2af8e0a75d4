"""Multi-host SERVING smoke: the CLI (not just the bench harness) drives
the distributed runtime (round-3 review weak #6).

Two OS processes run ``python -m nano_vllm_candle_tpu --nprocs 2 --rank i
--coordinator ...`` over CPU devices; both ranks must produce IDENTICAL
completions (the SPMD-determinism contract, parallel/distributed.py) — on a
real 2-host slice the same two commands are the whole deployment.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cli_serving_identical_text(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    def cmd(rank):
        # --tokens-out: the Gloo transport writes connection logs straight to
        # fd 1 from C++ threads, interleaving with the decoded completion on
        # stdout — compare the machine-readable token-id file instead.
        return [
            sys.executable, "-m", "nano_vllm_candle_tpu",
            "--preset", "tiny", "--device", "cpu",
            "--prompt", "hello world", "--max-tokens", "12",
            "--temperature", "0.7", "--ignore-eos",
            "--max-num-seqs", "4", "--max-model-len", "256",
            "--kv-blocks", "16", "--block-size", "16",
            "--log-level", "warn",
            "--tp", "2", "--dp", "2",
            "--nprocs", "2", "--rank", str(rank),
            "--coordinator", f"127.0.0.1:{port}",
            "--tokens-out", str(tmp_path / f"tokens_rank{rank}.json"),
        ]

    procs = [
        subprocess.Popen(cmd(rank), env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=560)
            outs.append((out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"CLI rank failed:\n{err[-4000:]}"

    tokens = [
        json.loads((tmp_path / f"tokens_rank{rank}.json").read_text())
        for rank in (0, 1)
    ]
    assert tokens[0] == tokens[1]
    assert len(tokens[0]) == 12  # ignore_eos honours max_tokens exactly


def test_cli_rejects_bad_multihost_flags():
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    base = [sys.executable, "-m", "nano_vllm_candle_tpu",
            "--preset", "tiny", "--device", "cpu", "-p", "x"]
    r = subprocess.run(base + ["--nprocs", "2"], env=env,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 2
    assert "--coordinator" in r.stderr
    r = subprocess.run(base + ["--nprocs", "2", "--rank", "5",
                               "--coordinator", "h:1"], env=env,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 2
    r = subprocess.run(base + ["--kv-blocks", "0"], env=env,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 2
