"""Multi-process (multi-host stand-in) mesh: N worker processes × M
virtual CPU devices join one jax.distributed runtime and run the
scene-sharded stage with cross-process collectives
(sfm_tpu/parallel/distributed.py; SURVEY §2.6 distributed-backend row).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh():
    n_procs, n_local = 2, 4
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_local}",
        "PALLAS_AXON_POOL_IPS": "",
        "PYTHONPATH": str(ROOT),
    })
    workers = [
        subprocess.Popen(
            [sys.executable, str(ROOT / "tests" / "distributed_worker.py"),
             coord, str(n_procs), str(p)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for p in range(n_procs)
    ]
    outs = []
    try:
        for w in workers:
            out, _ = w.communicate(timeout=420)
            outs.append(out)
    finally:
        for w in workers:
            if w.poll() is None:
                w.kill()
    for p, (w, out) in enumerate(zip(workers, outs)):
        assert w.returncode == 0, f"worker {p} failed:\n{out}"
        assert f"[w{p}] PASS" in out, out
