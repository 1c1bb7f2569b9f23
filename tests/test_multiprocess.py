"""True multi-PROCESS sharded solves (jax.distributed, 2 processes).

The virtual 8-device mesh in test_parallel.py exercises the sharding program
inside ONE process; this battery launches two separate Python processes that
form a global mesh via ``jax.distributed.initialize`` (cross-process
collectives run over Gloo — the CPU stand-in for DCN), which is exactly the
deployment shape of the BASELINE north star's multi-host pod: host-major
device order, per-process addressable shards, hierarchical psum reductions.
The reference has no distributed capability at all (SURVEY.md §2).

Each worker owns 4 virtual CPU devices, so the global mesh is 8 devices in
two process "hosts": the 2-D (host=2, chip=4) mesh crosses the process
boundary on its outer axis, and the 1-D mesh crosses it between devices 3
and 4. Workers verify the replicated psum statistics AND their local result
shards against a single-process reference solve of the same batch.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import os, sys
    pid, port, mode = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2
    assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8

    import numpy as np
    import jax.numpy as jnp
    from ssqp_tpu.types import Settings, make_qp
    from ssqp_tpu.parallel.batch import frontier_batch, solve_qp_batch
    from ssqp_tpu.parallel.sharded import (
        make_mesh, make_mesh_2d, shard_batch,
        solve_qp_sharded, solve_qp_sharded_2d,
    )

    rng = np.random.default_rng(7)
    N, B = 8, 16
    H = rng.standard_normal((N, N))
    V = H @ H.T / N + 0.5 * np.eye(N)
    mu = rng.uniform(0.0, 0.2, N)
    Q = make_qp(np.asarray(V, np.float32), np.asarray(mu, np.float32),
                u=np.full(N, 4.0 / N, np.float32), dtype=np.float32)
    lams = jnp.linspace(0.0, 2.0, B, dtype=jnp.float32)
    Qb, shared = frontier_batch(Q, lams)
    s = Settings.for_dtype(jnp.float32)

    # single-process-equivalent reference: plain vmap on this host's devices
    ref = solve_qp_batch(Qb, s, shared=shared)
    ref_x = np.asarray(ref.x)
    assert (np.asarray(ref.status) > 0).all()

    if mode == "2d":
        mesh = make_mesh_2d()  # infers (2 hosts, 4 chips) from process_count
        assert mesh.shape == {"host": 2, "chip": 4}, mesh.shape
        Qs = shard_batch(Qb, mesh, shared=shared, axis=("host", "chip"))
        res, stats = solve_qp_sharded_2d(Qs, s, mesh, shared=shared)
    else:
        mesh = make_mesh()
        Qs = shard_batch(Qb, mesh, shared=shared)
        res, stats = solve_qp_sharded(Qs, s, mesh, shared=shared)
    jax.block_until_ready(stats)

    # replicated cross-process psum statistics
    assert int(stats["solved"]) == B, stats
    assert int(stats["infeasible"]) == 0, stats

    # each process checks ITS addressable shards against the reference solve
    checked = 0
    for shard in res.x.addressable_shards:
        lo = shard.index[0].start or 0
        local = np.asarray(shard.data)
        want = ref_x[lo : lo + local.shape[0]]
        np.testing.assert_allclose(local, want, atol=5e-5)
        checked += local.shape[0]
    assert checked == B // 2, checked  # this process owns half the batch
    print(f"worker {pid} {mode} ok", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(mode: str) -> None:
    port = str(_free_port())
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers pick their own platform/flags; scrub the parent's test ones
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), port, mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-2000:]}"
        assert f"worker {i} {mode} ok" in out


@pytest.mark.parametrize("mode", ["1d", "2d"])
def test_two_process_sharded_solve(mode):
    """2-process global mesh: sharded solve + psum stats + shard values."""
    _run_workers(mode)
