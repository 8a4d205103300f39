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


TRAIN_WORKER = r"""
import os, sys
mode, pid, n, port, ds_path, out = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5], sys.argv[6]
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
import numpy as np
from perseus_tpu.train import train as tm
from perseus_tpu.train.config import TrainConfig
from perseus_tpu.data.dataset import KeypointDatasetConfig
from perseus_tpu.augment.pipeline import AugmentationConfig

aug = AugmentationConfig(
    planckian_jitter=False, blur=False, random_plasma_shadow=False, color_jiggle=False
)
cfg = TrainConfig(
    batch_size=8,
    n_epochs=2,
    dataset_config=KeypointDatasetConfig(dataset_path=ds_path),
    augmentation_config=aug,
    in_channels=4,
    amp=False,
    save_epochs=1000,
    cache_dataset=True,
    wandb_project="",
    data_on_device=(mode == "dd"),
    distributed=(n > 1),
    coordinator_address=(f"localhost:{port}" if n > 1 else ""),
    num_processes=n,
    process_id=pid,
)
result = tm.train(cfg)  # train() itself performs the distributed init
assert jax.process_count() == n, jax.process_count()

# checksum the first assembled GLOBAL batch through the exact loader +
# shard_batch path train() used: position-weighted moments detect any
# row permutation/misassembly bitwise
import jax.numpy as jnp
from perseus_tpu.data.dataset import PrefetchingLoader, PrunedKeypointDataset
from perseus_tpu.train.train import _prepare_aug_batch, make_mesh, shard_batch

mesh = make_mesh()
ds = PrunedKeypointDataset(cfg.dataset_config, train=True, cache=True)
loader = PrefetchingLoader(ds, 8 // n, shuffle=True, seed=cfg.random_seed,
                           shard_index=jax.process_index(), num_shards=n)
batch = next(iter(loader.epoch(0)))
sharded = shard_batch(
    {
        "images": np.asarray(_prepare_aug_batch(batch, 4, use_transplant=True)),
        "coords": np.asarray(batch["pixel_coordinates"], dtype=np.float32),
    },
    mesh,
    expected_global=8,
)

@jax.jit
def csum(a):
    w = jnp.arange(a.shape[0], dtype=jnp.float32) + 1.0
    flat = a.reshape(a.shape[0], -1)
    return jnp.stack([flat.sum(), (flat**2).sum(), (flat.sum(1) * w).sum()])

checksums = np.concatenate([np.asarray(csum(v)) for v in sharded.values()])

if jax.process_index() == 0:
    np.savez(
        out,
        final_train_loss=result["final_train_loss"],
        final_val_loss=result["final_val_loss"],
        loss_history=np.asarray(result["train_loss_history"]),
        batch_checksums=checksums,
        **{f"p_{k}": np.asarray(v) for k, v in result["state"].params.items()},
    )
    import shutil
    from perseus_tpu import ROOT
    shutil.rmtree(os.path.join(ROOT, "outputs", "models", result["run_id"]), ignore_errors=True)
print(f"OK {pid}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _clean_env(n_single_devices=None):
    env = dict(os.environ)
    extra = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([REPO, *extra])
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    if n_single_devices:
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_single_devices}"
    return env


def _run_train_equivalence(mode, tmp_path):
    """2-process train() vs a single-process run with the same global
    batch, seed, and device count (2). What IS exactly equal: the assembled
    global batches (make_array_from_process_local_data + the batch-blocked
    loader shards) — asserted bitwise via position-weighted checksums. What
    is NOT: XLA lowers DIFFERENT programs for the two topologies (fused
    in-program reductions vs local partials + gloo all-reduce), so results
    differ at rounding level and training chaos (BN + AdamW from random
    init) amplifies that over steps — losses are therefore compared at
    epoch granularity with tolerances that tighten toward epoch 0."""
    import sys as _sys

    _sys.path.insert(0, REPO)
    from perseus_tpu.data.synthetic import generate_synthetic_pruned_dataset

    ds_path = generate_synthetic_pruned_dataset(str(tmp_path / "ds"), n_train=32, n_test=8, h=32, w=32)
    script = tmp_path / "train_worker.py"
    script.write_text(TRAIN_WORKER)

    # single-process baseline: 2 virtual CPU devices
    out_single = str(tmp_path / "single.npz")
    p = subprocess.run(
        [sys.executable, str(script), mode, "0", "1", "0", ds_path, out_single],
        capture_output=True,
        text=True,
        env=_clean_env(n_single_devices=2),
        timeout=900,
    )
    assert p.returncode == 0, f"single-process run failed:\n{p.stdout}\n{p.stderr}"

    # 2-process run: one CPU device per process
    port = _free_port()
    out_multi = str(tmp_path / "multi.npz")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), mode, str(i), "2", str(port), ds_path, out_multi],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=_clean_env(),
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"OK {i}" in out, out

    a = np.load(out_single)
    b = np.load(out_multi)
    # the actual multi-host correctness claim: the global batches the two
    # topologies assemble are IDENTICAL (bitwise) — any permutation,
    # duplication, or misassembly of rows shows up here
    np.testing.assert_array_equal(
        a["batch_checksums"], b["batch_checksums"],
        err_msg="global batch assembly differs across topologies",
    )
    # training outcomes: epoch 0 is a few steps past identical math
    # (divergence is rounding-level, barely amplified); the final epoch
    # bounds gross divergence (wrong data/LR/weighting would blow this)
    np.testing.assert_allclose(
        a["loss_history"][0], b["loss_history"][0], rtol=2e-2,
        err_msg="epoch-0 train loss diverged across topologies",
    )
    np.testing.assert_allclose(
        a["final_train_loss"], b["final_train_loss"], rtol=0.2, atol=1e-3
    )
    np.testing.assert_allclose(
        a["final_val_loss"], b["final_val_loss"], rtol=0.2, atol=1e-3
    )
    for k in a.files:
        if k.startswith("p_"):
            assert np.isfinite(b[k]).all(), f"param {k} non-finite after 2-process run"
            np.testing.assert_allclose(
                a[k], b[k], atol=5e-2, err_msg=f"param {k} grossly diverged across topologies"
            )


def test_two_process_train_matches_single_process(tmp_path):
    """End-to-end tm.train() across 2 processes == single-process training
    at the same global batch/seed (round-2 Weak #1: the loader path's
    global-batch assembly)."""
    _run_train_equivalence("loader", tmp_path)


def test_two_process_train_data_on_device(tmp_path):
    """Same equivalence through the device-resident dataset path: each
    process decodes only the rows its devices own (sharding index map) and
    the assembled global arrays match the single-process run."""
    _run_train_equivalence("dd", tmp_path)


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
