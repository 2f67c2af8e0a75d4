"""Real multi-process execution test (VERDICT r1 item 3).

Spawns TWO OS processes that form a JAX multi-controller group over CPU
devices (``jax.distributed.initialize`` + Gloo collectives — the same
runtime a 2-host TPU slice uses, minus the ICI), builds the hybrid
``(dp=2, tp=2)`` mesh with dp crossing the process (DCN) boundary, and runs
a full prefill + pipelined-decode generation on each rank.

Asserts the SPMD-determinism contract (SURVEY.md §5.2 / parallel/
distributed.py): both ranks take identical scheduler decisions (slot order +
block tables) and produce identical sampled tokens at temperature > 0.

The reference has no distributed runtime at all to compare against
(``/root/reference/src/tp.rs:21-31`` is env-var scaffolding; no collectives
anywhere — SURVEY.md §5.8).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_multihost(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # 2 virtual devices per process -> 4 global devices for (dp=2, tp=2).
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_NUM_PROCESSES", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), "2", str(rank), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in (0, 1)
    ]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            logs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    recs = []
    for rank in (0, 1):
        path = tmp_path / f"rank{rank}.json"
        assert path.exists(), logs[rank][-4000:]
        recs.append(json.loads(path.read_text()))

    assert recs[0]["global_devices"] == recs[1]["global_devices"] == 4
    # Identical scheduler decisions on every host (slot order, block tables).
    assert recs[0]["prefill_decisions"] == recs[1]["prefill_decisions"]
    assert recs[0]["prefill_decisions"]  # non-empty
    # Identical sampled tokens (temperature 0.7: exercises the shared-seed
    # on-device sampling path, not just argmax).
    assert recs[0]["tokens"] == recs[1]["tokens"]
    assert len(recs[0]["tokens"]) == 3
    assert all(len(t) == 8 for t in recs[0]["tokens"])
    assert recs[0]["decode_tokens"] == recs[1]["decode_tokens"]
