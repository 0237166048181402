"""REAL multi-process distributed test: two OS processes join one JAX
coordination service (jax.distributed), form a global 8-device
(4 tiles x 2 spp) mesh spanning both, render through the production
work-queue megakernel under shard_map, and cross-check the assembled image
against a full-frame single-device render.

This is the multi-host story the reference cannot express at all (its
parallelism ends at the SYCL work-item grid, render.hpp:124-136); SURVEY.md
§5.8 requires the invented distributed backend to be exercised with
jax.process_count() > 1, which in-process virtual-device tests
(test_sharding.py) cannot do.
"""
import os
import pathlib
import socket
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_render(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",          # keep the axon plugin out
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": str(REPO),
    })
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "mp_worker.py"),
             str(port), str(pid), str(tmp_path)],
            env=env, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    for pid in (0, 1):
        f = tmp_path / f"p{pid}.txt"
        assert f.exists(), f"worker {pid} wrote no result"
        status, maxdiff = f.read_text().split()
        assert status == "OK"
        # wq-vs-jnp envelope on a textureless scene: reassociation only
        assert float(maxdiff) <= 2e-4, f"worker {pid} maxdiff {maxdiff}"
