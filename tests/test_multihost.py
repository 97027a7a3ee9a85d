"""Two-process ``jax.distributed`` rendezvous — the multi-host code path
EXECUTED, not just written.

Mirrors the reference's ``dist.init_process_group`` smoke surface
(``/root/reference/train.py:100-105``): two local CPU processes rendezvous
through ``parallel.mesh.initialize_multihost`` (coordinator on a loopback
port, like the reference's ``tcp://127.0.0.1`` + ``find_free_port``), then
run a REAL cross-process collective (``process_allgather``) and assert each
process sees both contributions.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
import jax

from stratified_transformer_tpu.parallel.mesh import initialize_multihost

pid = int(sys.argv[1])
initialize_multihost(
    coordinator={coord!r}, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid

import jax.numpy as jnp
from jax.experimental import multihost_utils

# a real cross-process collective: each process contributes pid + 1
got = multihost_utils.process_allgather(jnp.float32(pid + 1))
assert got.tolist() == [1.0, 2.0], got
# global device view spans both processes
assert jax.device_count() == 2 * jax.local_device_count()
print(f"proc {{pid}} OK", flush=True)
"""


def test_two_process_rendezvous_and_collective():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    child = _CHILD.format(repo=REPO, coord=coord)
    # Children must NOT init the XLA backend before
    # jax.distributed.initialize: drop the axon sitecustomize hook
    # (PALLAS_AXON_POOL_IPS gates it) and select the CPU backend by env
    # (honored once the axon plugin never registers).
    env = dict(os.environ, JAX_NUM_CPU_DEVICES="1", JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", child, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out, out
