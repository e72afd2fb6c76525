"""Two-process jax.distributed smoke test for the --multihost path (reference
main/distributed.py:63-137): CPU backend, tcp:// coordinator with the RANK/WORLD_SIZE env
convention, experiment-name broadcast agreement across processes."""

import os
import signal
import socket
import subprocess
import sys
import time

import pytest

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


# ---------------------------------------------------------------------------
# coordinated multihost preemption (round-5): SIGTERM on ONE host must stop
# EVERY host at the same step boundary (run.py:_preemption_stop's per-step flag
# all-reduce), produce one agreed mid-epoch checkpoint, and the resumed run must
# be bit-identical to an uninterrupted one (deterministic set_epoch data order +
# fold_in rng replay, reference run.py:420-448 extended to the TPU-pod model).

_PREEMPT_CLI = [
    "--dataset-type", "synthetic", "--model", "tiny-test",
    "--train-num-samples", "3200", "--batch-size", "16",
    "--epochs", "2", "--warmup", "5", "--workers", "1",
    "--report-to", "none", "--log-every-n-steps", "10",
    "--save-on-preemption", "--seed", "0", "--log-local",
]


def _launch_cli_pair(url, logs, name, extra=()):
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            RANK=str(rank), WORLD_SIZE="2", JAX_PLATFORMS="cpu",
            PALLAS_AXON_POOL_IPS="",
            PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
        )
        env.pop("XLA_FLAGS", None)
        out = open(os.path.join(logs, f"stdout-{name}-{rank}.log"), "w")
        procs.append((subprocess.Popen(
            [sys.executable, "-m", "multimodal_tpu.train.run", *_PREEMPT_CLI,
             "--multihost", "--dist-url", url, "--logs", logs, "--name", name,
             *extra],
            env=env, stdout=out, stderr=subprocess.STDOUT), out))
    return procs


def _wait_pair(procs, timeout=900):
    for p, out in procs:
        p.wait(timeout=timeout)
        out.close()
    for p, _ in procs:
        assert p.returncode == 0, f"rank exited rc={p.returncode}"


def _stdout_text(logs, name, rank):
    with open(os.path.join(logs, f"stdout-{name}-{rank}.log")) as f:
        return f.read()


def _restore_raw(ckpt_dir):
    """Template-free restore of the latest checkpoint as a raw numpy pytree."""
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(ckpt_dir)
    step = mgr.latest_step()
    assert step is not None, f"no checkpoint under {ckpt_dir}"
    restored = mgr.restore(step, args=ocp.args.Composite(
        state=ocp.args.StandardRestore(), metadata=ocp.args.JsonRestore()))
    mgr.close()
    return step, restored["state"], restored.get("metadata") or {}


def test_preemption_stop_single_host_semantics():
    """Single-host (and multihost-without-save-on-preemption): _preemption_stop is the
    plain local flag — no collective, flag set only by SIGTERM."""
    from types import SimpleNamespace

    from multimodal_tpu.train import run as runmod

    runmod._PREEMPTED.clear()
    local = SimpleNamespace(multihost=False, save_on_preemption=True)
    off = SimpleNamespace(multihost=True, save_on_preemption=False)
    assert runmod._preemption_stop(local) is False
    assert runmod._preemption_stop(off) is False
    runmod._PREEMPTED.set()
    try:
        assert runmod._preemption_stop(local) is True
        assert runmod._preemption_stop(off) is True
    finally:
        runmod._PREEMPTED.clear()


@pytest.mark.slow
def test_two_process_coordinated_preemption(tmp_path):
    """SIGTERM to rank 1 only: the per-step flag all-reduce stops BOTH ranks at the
    same step; both participate in one agreed mid-epoch save; resuming finishes the
    run with a final state bit-identical to an uninterrupted baseline."""
    import numpy as np

    logs = str(tmp_path)

    # --- interrupted run: SIGTERM rank 1 once training is demonstrably underway
    url = f"tcp://localhost:{_free_port()}"
    procs = _launch_cli_pair(url, logs, "preempt")
    r0_log = os.path.join(logs, "stdout-preempt-0.log")
    deadline = time.time() + 300
    while time.time() < deadline:
        if os.path.exists(r0_log) and "step 10 loss" in open(r0_log).read():
            break
        if procs[0][0].poll() is not None:
            break
        time.sleep(0.2)
    assert procs[1][0].poll() is None, "run finished before the signal could land"
    os.kill(procs[1][0].pid, signal.SIGTERM)
    _wait_pair(procs)

    saved_steps = []
    for rank in range(2):
        text = _stdout_text(logs, "preempt", rank)
        lines = [l for l in text.splitlines() if "preemption signal received" in l]
        assert lines, f"rank {rank} did not take the coordinated-stop path"
        saved_steps.append(int(lines[-1].split("saved step ")[1].split(" ")[0]))
    assert saved_steps[0] == saved_steps[1], (
        f"hosts saved different steps: {saved_steps}")

    ckpt_dir = os.path.join(logs, "preempt", "checkpoints")
    step, _, meta = _restore_raw(ckpt_dir)
    assert step == saved_steps[0]
    assert meta.get("mid_epoch") is True

    # --- resume to completion
    url = f"tcp://localhost:{_free_port()}"
    _wait_pair(_launch_cli_pair(url, logs, "preempt", extra=("--resume", "latest")))

    # --- uninterrupted baseline with the identical recipe
    url = f"tcp://localhost:{_free_port()}"
    _wait_pair(_launch_cli_pair(url, logs, "baseline"))

    step_r, state_r, _ = _restore_raw(ckpt_dir)
    step_b, state_b, _ = _restore_raw(os.path.join(logs, "baseline", "checkpoints"))
    assert step_r == step_b == 2 * (3200 // 16)
    flat_r = jax_flatten_with_paths(state_r)
    flat_b = jax_flatten_with_paths(state_b)
    assert list(flat_r) == list(flat_b)  # same leaf paths
    for path in flat_r:
        a, b = flat_r[path], flat_b[path]
        assert np.array_equal(np.asarray(a), np.asarray(b), equal_nan=True), (
            f"resumed run diverged from uninterrupted baseline at {path}")


def jax_flatten_with_paths(tree):
    import jax

    return {jax.tree_util.keystr(kp): v
            for kp, v in jax.tree_util.tree_flatten_with_path(tree)[0]}
