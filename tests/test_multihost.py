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


# (the name-broadcast check rides inside TRAIN_WORKER below: one 2-process
# jax.distributed session instead of two — CI-latency item, round 3)


TRAIN_WORKER = """
import sys
sys.path.insert(0, {repo!r})
import jax
import numpy as np
from multimodal_tpu.train.run import init_multihost

init_multihost({url!r})
assert jax.process_count() == 2
from multimodal_tpu.train.run import resolve_experiment_name
from multimodal_tpu.train.params import parse_args

args = parse_args(["--dataset-type", "synthetic", "--model", "tiny-test",
                   "--multihost", "--dist-url", {url!r}])
print("NAME:" + resolve_experiment_name(args, jax.process_count()), flush=True)
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_tpu.models import create_model, init_params
from multimodal_tpu.parallel import create_mesh
from multimodal_tpu.train import TrainState, make_optimizer, make_schedule, make_train_step

# a 2-device global mesh: one CPU device per process, DP over both
mesh = create_mesh(devices=jax.devices())
model = create_model("tiny-test")
params = init_params(model)
tx = make_optimizer(make_schedule("cosine", 1e-3, 2, 50))
state = jax.device_put(TrainState.create(params, tx), NamedSharding(mesh, P()))
step = make_train_step(model, tx, loss_type="clip", mesh=mesh, donate=False)

rng = np.random.default_rng(0)  # same on both hosts
c = model.cfg
host_batch = {{
    "image": rng.integers(0, 256, (8, c.vision.image_size, c.vision.image_size, 3),
                          dtype=np.uint8),
    "text": rng.integers(1, c.text.vocab_size - 1, (8, c.text.context_length)).astype(
        np.int32),
}}
from jax.experimental import multihost_utils

batch = {{k: multihost_utils.host_local_array_to_global_array(
    v[jax.process_index() * 4 : (jax.process_index() + 1) * 4], mesh, P("data"))
    for k, v in host_batch.items()}}
losses = []
for _ in range(3):
    state, m = step(state, batch, jax.random.PRNGKey(0))
    # the loss is a replicated global scalar: read this host's addressable replica
    losses.append(float(np.asarray(m["loss"].addressable_data(0))))
print("LOSSES:" + ",".join(f"{{l:.6f}}" for l in losses), flush=True)

# the flagship scale-out form across a REAL process boundary: ring-streamed contrastive
# (shard_map + ppermute over the 2-process mesh) must match the dense GSPMD loss
ring_step = make_train_step(model, tx, loss_type="clip", mesh=mesh, donate=False,
                            use_shard_map=True,
                            loss_kwargs={{"contrastive_impl": "ring"}})
ring_state = jax.device_put(TrainState.create(init_params(model), tx),
                            NamedSharding(mesh, P()))
dense_state = jax.device_put(TrainState.create(init_params(model), tx),
                             NamedSharding(mesh, P()))
ring_state, rm = ring_step(ring_state, batch, jax.random.PRNGKey(0))
dense_state, dm = step(dense_state, batch, jax.random.PRNGKey(0))
rl = float(np.asarray(rm["loss"].addressable_data(0)))
dl = float(np.asarray(dm["loss"].addressable_data(0)))
print(f"RING:{{rl:.6f}}:{{dl:.6f}}", flush=True)
"""


def test_two_process_multihost_train_step():
    """A real cross-process DP train step: 2 jax.distributed CPU processes form a 2-device
    mesh, run 3 jitted sharded steps on a process-local batch slice, and agree on finite,
    decreasing losses — the strongest hardware-free guarantee for --multihost."""
    url = f"tcp://localhost:{_free_port()}"
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            RANK=str(rank), WORLD_SIZE="2", JAX_PLATFORMS="cpu",
            PALLAS_AXON_POOL_IPS="",
        )
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", TRAIN_WORKER.format(repo=REPO, url=url)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]
    names = [l for out, _ in outs for l in out.splitlines() if l.startswith("NAME:")]
    assert len(names) == 2 and names[0] == names[1]  # rank-0 name broadcast agreement
    assert names[0].startswith("NAME:tiny-test-clip-")
    loss_lines = [l for out, _ in outs for l in out.splitlines()
                  if l.startswith("LOSSES:")]
    assert len(loss_lines) == 2
    assert loss_lines[0] == loss_lines[1]  # both hosts computed the same global losses
    vals = [float(x) for x in loss_lines[0].split(":")[1].split(",")]
    import numpy as np

    assert np.all(np.isfinite(vals)) and vals[-1] < vals[0]
    # ring (shard_map + cross-process ppermute) == dense GSPMD on the same batch/params
    ring_lines = [l for out, _ in outs for l in out.splitlines() if l.startswith("RING:")]
    assert len(ring_lines) == 2 and ring_lines[0] == ring_lines[1]
    _, rl, dl = ring_lines[0].split(":")
    np.testing.assert_allclose(float(rl), float(dl), rtol=1e-4)
