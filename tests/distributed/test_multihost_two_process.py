"""TRUE two-process multihost test: jax.distributed + Gloo CPU collectives.

The reference's distributed path is untestable without real GPUs + torchrun
(its tests skip, reference ``tests/distributed/test_matching_distributed.py:
116-119``).  Here the multi-controller runtime itself — two OS processes,
each owning 2 virtual CPU devices, coordinated by ``jax.distributed`` with
cross-process Gloo collectives — runs the sharded matching solve end to end
and must reproduce the Scala golden trace (the same four pinned values the
reference asserts for its 2-GPU NCCL run, reference ``:183-195``), through
BOTH multihost input pipelines (replicated-host ctor and per-host
``assemble_global_tiles``).
"""

from __future__ import annotations

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.objectives.test_dualip_matching_simplex import TRUE_VALUES

REPO = Path(__file__).resolve().parents[2]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("nproc", [2])
def test_two_process_golden_trace(tmp_path, nproc):
    port = _free_port()
    outs = [tmp_path / f"proc{i}.json" for i in range(nproc)]
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                "tests.distributed._multihost_worker",
                str(i),
                str(nproc),
                str(port),
                str(outs[i]),
            ],
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(nproc)
    ]
    tails = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        tails.append(out[-2000:])
    assert all(p.returncode == 0 for p in procs), "\n===\n".join(tails)

    logs = [json.loads(o.read_text()) for o in outs]
    for key in ("log_replicated", "log_assembled", "log_butterfly"):
        ref = np.asarray(logs[0][key])
        for lg in logs[1:]:
            # every controller computes the identical replicated trace
            np.testing.assert_allclose(np.asarray(lg[key]), ref, rtol=0, atol=1e-6)
        for i, true_val in TRUE_VALUES:
            assert abs(ref[i - 1] - true_val) < 1e-5, (key, i, ref[i - 1], true_val)
