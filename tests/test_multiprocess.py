"""Real 2-process multi-host test (VERDICT r2 #7): two local jax.distributed
processes on the CPU backend compress one sharded batch; outputs must be
identical on both processes and decodable by stock libzstd.

Mirrors what a 2-host pod slice does over DCN, using the loopback
coordinator. The worker runs in subprocesses because jax.distributed can
only be initialized once per process.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys, pickle
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np
sys.path.insert(0, os.getcwd())  # launched with cwd = repo root
from tpu_zstd.ops.pipeline import PipelineConfig
from tpu_zstd.parallel.multihost import compress_batch_distributed

cfg = PipelineConfig(block_size=4096, hash_log=13, mf_win_log=0)
rng = np.random.default_rng(77)
items = [
    b"distributed compression payload " * 300,
    rng.integers(0, 256, 6000, dtype=np.uint8).tobytes(),
    b"A" * 9000,
]
# Instrument the payload all-gather: DCN volume must stay near the
# compressed size, not the padded batch (round-3 review weak #6).
from jax.experimental import multihost_utils as mhu
import tpu_zstd.parallel.sharding as SH
vol = {"payload": 0}
orig_ag = mhu.process_allgather
def counting_ag(x, tiled=False):
    r = orig_ag(x, tiled=tiled)
    import numpy as _np
    a = _np.asarray(r)
    if a.ndim == 2:  # the contents payload
        vol["payload"] = a.size * a.itemsize
    return r
mhu.process_allgather = counting_ag
SH.mhu = mhu  # module imports it lazily inside the function; patch global
frames = compress_batch_distributed(items, cfg)
mhu.process_allgather = orig_ag
import zstandard
d = zstandard.ZstdDecompressor()
for it, f in zip(items, frames):
    assert d.decompress(f, max_output_size=len(it)) == it
total_comp = sum(len(f) for f in frames)
assert vol["payload"] > 0
assert vol["payload"] < max(1.5 * total_comp, 3 * 4096 * 8), (
    vol["payload"], total_comp)
with open(sys.argv[3], "wb") as fh:
    pickle.dump(frames, fh)
print("WORKER_OK", pid)
"""


@pytest.mark.timeout(600)
def test_two_process_sharded_compress(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    outs = [tmp_path / "out0.pkl", tmp_path / "out1.pkl"]
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port), str(outs[pid])],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        logs.append(out.decode(errors="replace"))
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log[-3000:]}"
        assert f"WORKER_OK {pid}" in log
    import pickle

    frames0 = pickle.load(open(outs[0], "rb"))
    frames1 = pickle.load(open(outs[1], "rb"))
    assert frames0 == frames1  # every process assembles identical output


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
