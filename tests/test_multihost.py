"""Two-process jax.distributed smoke test for the --multihost path (reference
main/distributed.py:63-137): CPU backend, tcp:// coordinator with the RANK/WORLD_SIZE env
convention, experiment-name broadcast agreement across processes."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import sys
sys.path.insert(0, {repo!r})
import jax
from multimodal_tpu.train.run import init_multihost, resolve_experiment_name
from multimodal_tpu.train.params import parse_args

init_multihost({url!r})
assert jax.process_count() == 2, jax.process_count()
args = parse_args(["--dataset-type", "synthetic", "--model", "tiny-test",
                   "--multihost", "--dist-url", {url!r}])
name = resolve_experiment_name(args, jax.process_count())
print("NAME:" + name, flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_multihost_name_broadcast():
    url = f"tcp://localhost:{_free_port()}"
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            RANK=str(rank), WORLD_SIZE="2", JAX_PLATFORMS="cpu",
            PALLAS_AXON_POOL_IPS="",
        )
        env.pop("XLA_FLAGS", None)  # one local CPU device per process
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER.format(repo=REPO, url=url)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]
    names = [l for out, _ in outs for l in out.splitlines() if l.startswith("NAME:")]
    assert len(names) == 2
    # rank 0's timestamped name was broadcast: both processes resolved identically
    assert names[0] == names[1]
    assert names[0].startswith("NAME:tiny-test-clip-")
