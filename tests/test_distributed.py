"""Two-process distributed runtime smoke test.

Launches two REAL processes on CPU wired through GNNRA_COORDINATOR /
GNNRA_NPROC / GNNRA_PROC_ID (the launch contract of
parallel/distributed.py:30-60), asserting: initialize_from_env returns
True, the global device count is 2x the local count, a psum over a global
mesh is correct across the process boundary, and is_primary() gates
exactly one writer. The reference has no multi-process anything
(SURVEY.md §2 communication backend row) — this validates the new
capability end to end, not just the single-process no-op path.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import jax
    jax.config.update("jax_platforms", "cpu")   # outranks the axon hook
    import jax.numpy as jnp
    from functools import partial
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from gnnra_tpu.parallel import distributed

    ok = distributed.initialize_from_env()
    assert ok, "initialize_from_env returned False under GNNRA_* env"
    assert jax.process_count() == 2, jax.process_count()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == 2 * n_local, (n_global, n_local)

    mesh = distributed.global_mesh((n_global,), ("data",))

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P(), out_specs=P())
    def f(x):
        return x + jax.lax.psum(
            jax.lax.axis_index("data").astype(jnp.float32) + 1.0, "data")

    total = float(f(jnp.zeros(()))[()])
    want = n_global * (n_global + 1) / 2
    assert total == want, (total, want)
    print(f"WORKER_OK proc={jax.process_index()} "
          f"primary={distributed.is_primary()} psum={total} "
          f"devices={n_global}", flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_psum_and_primary_gating(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "GNNRA_COORDINATOR": f"127.0.0.1:{port}",
            "GNNRA_NPROC": "2",
            "GNNRA_PROC_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": repo,
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_py)], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=180)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed workers timed out (port/runtime issue)")

    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out}\n{err[-2000:]}"
        assert "WORKER_OK" in out, out
    primaries = [("primary=True" in out) for _, out, _ in outs]
    assert sum(primaries) == 1, f"exactly one primary writer: {outs}"
