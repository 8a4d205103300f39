"""Multi-host wiring tests: jax.distributed rendezvous + cross-process
collectives on CPU, the harness train() uses for DCN training
(perseus_tpu/train/train.py:maybe_initialize_distributed; the role of the
reference's TCP rendezvous + DistributedSampler, reference:
perseus/detector/train.py:122-152).

Two subprocesses rendezvous on localhost, build a 2-device global mesh
(one CPU device per process), assemble a global batch from process-local
shards, and reduce across processes — exactly the data path train() runs
per host.
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"localhost:{port}", num_processes=n, process_id=pid)
assert jax.process_count() == n, jax.process_count()
assert jax.process_index() == pid
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = jax.make_mesh((n,), ("data",), axis_types=(jax.sharding.AxisType.Auto,))

# per-host loader shards must be disjoint and cover the global permutation
from perseus_tpu.data.dataset import PrefetchingLoader
class _FakeDataset:
    def __len__(self):
        return 12
    def batch(self, indices):
        return {"idx": np.asarray(indices)}
loader = PrefetchingLoader(_FakeDataset(), batch_size=2, shuffle=True, seed=0,
                           shard_index=pid, num_shards=n)
mine = np.concatenate([b["idx"] for b in loader.epoch(0)])

# global reduction over a batch assembled from process-local shards
local = np.full((2, 3), float(pid), np.float32)
garr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data")), local)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
expected = 6.0 * sum(range(n))
assert abs(float(total) - expected) < 1e-6, (float(total), expected)
print(f"SHARD {pid} {sorted(int(i) for i in mine)}", flush=True)
print(f"OK {pid}", flush=True)
"""


def test_two_process_rendezvous_and_reduction(tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    port_no = port.getsockname()[1]
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    # The axon TPU plugin's sitecustomize registers its backend at
    # interpreter start, which pre-empts the distributed CPU client
    # (process_count would stay 1) — keep it off the workers' path.
    extra = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([REPO, *extra])
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # exactly one CPU device per process

    n = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(n), str(port_no)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(n)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"OK {i}" in out, out

    # the two host shards must partition the 12-element permutation
    shards = []
    for out in outs:
        line = next(l for l in out.splitlines() if l.startswith("SHARD"))
        shards.append(eval(line.split(" ", 2)[2]))
    assert not set(shards[0]) & set(shards[1])
    assert len(shards[0]) + len(shards[1]) == 12
