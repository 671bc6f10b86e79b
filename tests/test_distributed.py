"""Multi-process jax.distributed smoke (SURVEY.md §2 "Distributed comm
backend" row; VERDICT r4 missing #3: ``parallel/distributed.py`` wrapped
``jax.distributed.initialize`` but no test or dryrun ever executed it).

Two REAL OS processes on the CPU backend form a 2-process JAX cluster via
:func:`zerospeech_tts_tpu.parallel.distributed.initialize` (auto-detected
from the standard env vars, exactly the multi-host production path), lay a
global mesh over the cross-process devices, and run one jitted global-sum
— a genuine cross-process collective — plus a ``process_allgather``.
Everything multi-device elsewhere in the suite is single-process fake-mesh;
this is the one place the process-boundary code path actually runs.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

from zerospeech_tts_tpu.parallel.distributed import initialize, is_primary

ok = initialize()  # auto-detect from JAX_COORDINATOR_ADDRESS / _NUM_PROCESSES / _PROCESS_ID
assert ok, "initialize() returned False despite the env vars being set"

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

pc, pi = jax.process_count(), jax.process_index()
devs = jax.devices()  # spans BOTH processes after initialize
mesh = Mesh(np.array(devs), ("data",))
shard = NamedSharding(mesh, P("data"))

# one row per global device; this process fills only its local rows
n_local = jax.local_device_count()
arr = jax.make_array_from_callback(
    (len(devs), 4), shard,
    lambda idx: np.full((n_local, 4), float(pi + 1), np.float32)[: idx[0].stop - idx[0].start],
)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
gathered = multihost_utils.process_allgather(jnp.float32(pi + 1))

print(json.dumps({
    "process_count": pc,
    "process_index": pi,
    "is_primary": is_primary(),
    "n_devices": len(devs),
    "global_sum": float(total),
    "allgather": np.asarray(gathered).tolist(),
}))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_cluster(port: int):
    """Start the 2 workers against ``port``; returns (rc, out, err) lists."""
    env_base = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")  # workers: 1 real CPU device each
    }
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=REPO + os.pathsep + env_base.get("PYTHONPATH", ""),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker hung (coordinator handshake?)")
        results.append((p.returncode, out, err))
    return results


def test_two_process_psum_and_allgather():
    # _free_port closes its probe socket before the coordinator binds the
    # port (unavoidable: the coordinator must bind it itself), so another
    # process can grab it in between; retry on fresh ports rather than
    # flaking under parallel load
    for attempt in range(3):
        results = _launch_cluster(_free_port())
        if all(rc == 0 for rc, _, _ in results):
            break
        if attempt == 2:
            for rc, _, err in results:
                assert rc == 0, f"worker failed on every port attempt:\n{err[-2000:]}"
    outs = [json.loads(out.strip().splitlines()[-1]) for _, out, _ in results]

    n_dev = outs[0]["n_devices"]
    assert n_dev >= 2 and outs[1]["n_devices"] == n_dev
    per_proc = n_dev // 2
    # rows from process 0 are all 1.0, from process 1 all 2.0
    expect_sum = 4.0 * per_proc * (1.0 + 2.0)
    for o in outs:
        assert o["process_count"] == 2
        assert o["global_sum"] == expect_sum  # cross-process psum agreed everywhere
        assert sorted(o["allgather"]) == [1.0, 2.0]
    assert outs[0]["is_primary"] != outs[1]["is_primary"]
    assert {outs[0]["process_index"], outs[1]["process_index"]} == {0, 1}
