"""Multi-host (DCN) training-path test: two REAL processes, each with 2
virtual CPU devices, joined by ``jax.distributed`` through the generic
coordinator env vars, running ONE product-path train step over the
4-device global mesh (SURVEY §2.5; the reference gets multi-node from
Lightning DDP, src/main.py:96-110).
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["FREESPLAT_REPO"])

from freesplat_tpu.parallel.distributed import (
    make_mesh,
    maybe_initialize_distributed,
    replicate_state,
    shard_batch,
)

assert maybe_initialize_distributed(), "distributed init failed"
assert jax.process_count() == 2
assert len(jax.devices()) == 4

import numpy as np
from tests.test_distributed_fit import make_batch, tiny_cfg
from freesplat_tpu.training.trainer import init_state, make_train_step

cfg = tiny_cfg()
# Same seed everywhere -> identical replicated state.
state = init_state(cfg, jax.random.PRNGKey(0), make_batch(1))
mesh = make_mesh("auto")
assert mesh.devices.size == 4

# Each process contributes its LOCAL half of the global batch of 4.
pid = jax.process_index()
local = make_batch(2, seed=100 + pid)
step = make_train_step(cfg, mesh=mesh)
new_state, metrics = step(replicate_state(mesh, state), shard_batch(mesh, local))
loss = float(metrics["loss"])
assert np.isfinite(loss), loss
print(f"MULTIHOST_OK proc={pid} loss={loss:.6f}", flush=True)
"""


def test_two_process_train_step(tmp_path):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["FREESPLAT_REPO"] = os.path.dirname(os.path.dirname(__file__))
    env["COORDINATOR_ADDRESS"] = "localhost:29521"
    env["NUM_PROCESSES"] = "2"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    procs = []
    for pid in range(2):
        e = dict(env)
        e["PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=e,
                cwd=env["FREESPLAT_REPO"],
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out
    # Both processes computed the SAME global loss (psum across DCN).
    losses = {
        line.split("loss=")[1]
        for out in outs
        for line in out.splitlines()
        if "MULTIHOST_OK" in line
    }
    assert len(losses) == 1, losses
