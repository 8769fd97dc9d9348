"""Multi-host init (vlnce_tpu/parallel/distributed.py).

The real thing needs a pod; here we validate (a) the env-var resolution
logic, and (b) an actual two-process jax.distributed rendezvous on
localhost CPU — the single-host smoke for the pod path wired into run.py.
"""

import os
import socket
import subprocess
import sys

import pytest

from vlnce_tpu.parallel.distributed import init_distributed


def test_single_host_is_noop(monkeypatch):
    for var in ("SLURM_JOB_NODELIST", "SLURM_PROCID", "COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert init_distributed() is False


def test_explicit_single_process_is_noop():
    assert init_distributed("localhost:9999", num_processes=1, process_id=0) is False


WORKER = r"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from vlnce_tpu.parallel.distributed import init_distributed
ok = init_distributed()
assert ok, "expected multi-process init"
import jax.numpy as jnp
assert jax.process_count() == 2
# one collective across the two processes proves the rendezvous works
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
mesh = Mesh(jax.devices()[:2], ("data",))
f = shard_map(lambda x: jax.lax.psum(x, "data"), mesh=mesh,
              in_specs=P("data"), out_specs=P())
out = jax.jit(f)(jnp.arange(2, dtype=jnp.float32))
assert float(out[0]) == 1.0, out
print("DISTRIBUTED_OK", jax.process_index())
"""


def test_two_process_rendezvous(tmp_path):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # no virtual device multiplication here
        env.update(
            JAX_PLATFORMS="cpu",
            COORDINATOR_ADDRESS=f"localhost:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    outs = [p.communicate(timeout=110)[0].decode() for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert "DISTRIBUTED_OK" in out


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_aligned_step_signature_includes_tree_structure():
    """_AlignedStep keys its compiled-executable cache on the pytree
    STRUCTURE as well as the leaf shapes: two calls with identical leaves
    but different dict keys/nesting must compile separately, not silently
    reuse the wrong executable (ADVICE r4)."""
    import jax
    import jax.numpy as jnp

    from vlnce_tpu.parallel.distributed import _AlignedStep

    def f(tree):
        if "a" in tree:
            return tree["a"] * 2.0
        return tree["b"]["x"] + 1.0

    step = _AlignedStep(jax.jit(f), "sig_test")
    x = jnp.ones((3,), jnp.float32)
    out_a = step({"a": x})
    out_b = step({"b": {"x": x}})  # same single [3] f32 leaf, new structure
    assert len(step._compiled) == 2
    assert float(out_a[0]) == 2.0 and float(out_b[0]) == 2.0
    # scalar leaves key by python type, and repeat calls hit the cache
    step({"a": x})
    assert len(step._compiled) == 2
