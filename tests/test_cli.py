"""End-to-end CLI: synthetic train loop, checkpoint/resume, params.txt, results.jsonl.

Counterpart of the reference's synthetic-backend train-loop exercise (main/data.py:582-608 +
run.py:276): the full orchestration runs with no data and no network."""

import json
import os

import numpy as np
import pytest

from multimodal_tpu.train.run import evaluate, main


BASE = [
    "--dataset-type", "synthetic", "--model", "tiny-test", "--batch-size", "16",
    "--train-num-samples", "48", "--warmup", "2", "--lr", "1e-3",
    "--log-every-n-steps", "2", "--save-frequency", "1", "--seed", "3",
]


def test_cli_train_checkpoint_resume(tmp_path):
    logs = str(tmp_path)
    assert main(BASE + ["--epochs", "1", "--logs", logs, "--name", "exp"]) == 0

    exp = os.path.join(logs, "exp")
    assert os.path.exists(os.path.join(exp, "params.txt"))
    records = [json.loads(l) for l in open(os.path.join(exp, "results.jsonl"))]
    assert records and np.isfinite(records[-1]["loss"])
    assert records[-1]["samples_per_s"] > 0

    # resume continues from the saved step instead of restarting
    assert main(BASE + ["--epochs", "2", "--logs", logs, "--name", "exp",
                        "--resume", "latest"]) == 0
    records2 = [json.loads(l) for l in open(os.path.join(exp, "results.jsonl"))]
    assert records2[-1]["step"] > records[-1]["step"]
    assert records2[-1]["epoch"] == 1


def test_cli_midepoch_resume_matches_uninterrupted(tmp_path):
    """Preemption-safe checkpointing: --save-frequency-steps saves mid-epoch; resuming
    from a mid-epoch checkpoint fast-forwards the deterministic data stream and replays
    the fold_in rng, reproducing the uninterrupted run's final params exactly."""
    import shutil

    import jax

    # reference run: 2 epochs straight through (3 steps/epoch at 48/16)
    assert main(BASE + ["--epochs", "2", "--logs", str(tmp_path), "--name", "full"]) == 0

    # interrupted run: epoch 0 with a mid-epoch save at global step 2, then simulate
    # preemption by deleting every checkpoint after it (incl. the epoch-end save)
    assert main(BASE + ["--epochs", "1", "--logs", str(tmp_path), "--name", "pre",
                        "--save-frequency-steps", "2"]) == 0
    ckpt_dir = tmp_path / "pre" / "checkpoints"
    steps = sorted(int(p.name) for p in ckpt_dir.iterdir() if p.name.isdigit())
    assert 2 in steps, f"expected a mid-epoch save at step 2, have {steps}"
    for s in steps:
        if s > 2:
            shutil.rmtree(ckpt_dir / str(s))

    # resume: should re-enter epoch 0 at batch 2, finish it, and run epoch 1
    assert main(BASE + ["--epochs", "2", "--logs", str(tmp_path), "--name", "pre",
                        "--resume", "latest"]) == 0

    from multimodal_tpu.train.checkpoints import CheckpointManager
    from multimodal_tpu.models import create_model, init_params
    from multimodal_tpu.train import TrainState, make_optimizer, make_schedule

    model = create_model("tiny-test")
    tx = make_optimizer(make_schedule("cosine", 1e-3, 2, 100))
    template = jax.device_get(TrainState.create(init_params(model), tx))
    final = {}
    for name in ("full", "pre"):
        mgr = CheckpointManager(str(tmp_path / name / "checkpoints"))
        assert mgr.latest_step() == 6, f"{name}: {mgr.all_steps()}"
        final[name], _ = mgr.restore(template)
        mgr.close()
    for a, b in zip(jax.tree_util.tree_leaves(final["full"].params),
                    jax.tree_util.tree_leaves(final["pre"].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_cli_model_ema_trains_and_checkpoints(tmp_path):
    """--model-ema: the run completes, and the checkpoint carries an EMA tree that
    tracks but differs from the raw params."""
    import jax

    assert main(BASE + ["--epochs", "1", "--logs", str(tmp_path), "--name", "ema",
                        "--model-ema", "--model-ema-decay", "0.9", "--val-data",
                        "synthetic", "--val-num-samples", "32"]) == 0
    from multimodal_tpu.models import create_model, init_params
    from multimodal_tpu.train import (CheckpointManager, TrainState, make_optimizer,
                                      make_schedule)

    model = create_model("tiny-test")
    tx = make_optimizer(make_schedule("cosine", 1e-3, 2, 100))
    template = jax.device_get(TrainState.create(init_params(model), tx, ema=True))
    mgr = CheckpointManager(str(tmp_path / "ema" / "checkpoints"))
    st, _ = mgr.restore(template)
    mgr.close()
    assert st.ema_params is not None
    pl = jax.tree_util.tree_leaves(st.params)
    el = jax.tree_util.tree_leaves(st.ema_params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(pl, el))
    assert all(np.isfinite(np.asarray(b)).all() for b in el)


def test_cli_resume_tolerates_ema_toggle(tmp_path):
    """Resuming a non-EMA checkpoint with --model-ema seeds the EMA from the restored
    params instead of failing on the pytree mismatch (and vice versa drops it)."""
    assert main(BASE + ["--epochs", "1", "--logs", str(tmp_path), "--name", "tog"]) == 0
    assert main(BASE + ["--epochs", "2", "--logs", str(tmp_path), "--name", "tog",
                        "--resume", "latest", "--model-ema"]) == 0
    # and back: the EMA-carrying checkpoint resumes into a non-EMA run
    assert main(BASE + ["--epochs", "3", "--logs", str(tmp_path), "--name", "tog",
                        "--resume", "latest"]) == 0


def test_cli_boundary_step_save_gets_clean_epoch_metadata(tmp_path):
    """A step-frequency save landing exactly on the epoch boundary is replaced by the
    clean epoch-end save, so resume starts the NEXT epoch instead of replaying."""
    from multimodal_tpu.train.checkpoints import CheckpointManager

    # 3 steps/epoch, save every 3 steps -> the mid-epoch save collides with epoch end
    assert main(BASE + ["--epochs", "1", "--logs", str(tmp_path), "--name", "bnd",
                        "--save-frequency-steps", "3"]) == 0
    mgr = CheckpointManager(str(tmp_path / "bnd" / "checkpoints"))
    assert mgr.latest_step() == 3
    from multimodal_tpu.models import create_model, init_params
    from multimodal_tpu.train import TrainState, make_optimizer, make_schedule

    model = create_model("tiny-test")
    tx = make_optimizer(make_schedule("cosine", 1e-3, 2, 100))
    import jax

    _, meta = mgr.restore(jax.device_get(TrainState.create(init_params(model), tx)))
    mgr.close()
    assert not (meta or {}).get("mid_epoch"), meta


def test_sigterm_sets_preemption_flag():
    """The installed handler turns a real SIGTERM into the preemption event."""
    import os as _os
    import signal

    from multimodal_tpu.train import run as run_mod

    run_mod._PREEMPTED.clear()
    run_mod._install_preemption_handler()
    try:
        _os.kill(_os.getpid(), signal.SIGTERM)
        assert run_mod._PREEMPTED.wait(timeout=5)
    finally:
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        run_mod._PREEMPTED.clear()


def test_cli_preemption_checkpoints_and_resumes(tmp_path, monkeypatch):
    """A preemption flag raised mid-training makes the run checkpoint immediately and
    exit cleanly; --resume latest then picks up mid-epoch. The flag is raised
    deterministically by patching the handler installer (the real SIGTERM->flag path is
    test_sigterm_sets_preemption_flag); the loop then must save after the FIRST step."""
    from multimodal_tpu.train import run as run_mod

    monkeypatch.setattr(run_mod, "_install_preemption_handler", run_mod._PREEMPTED.set)
    try:
        rc = main(BASE + ["--epochs", "2", "--logs", str(tmp_path), "--name", "evict"])
    finally:
        monkeypatch.undo()  # the resume run below must not re-raise the flag
        run_mod._PREEMPTED.clear()
    assert rc == 0
    from multimodal_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "evict" / "checkpoints"))
    assert mgr.latest_step() == 1  # saved right after the first step
    mgr.close()

    # resume finishes the remaining 5 of 6 steps
    assert main(BASE + ["--epochs", "2", "--logs", str(tmp_path), "--name", "evict",
                        "--resume", "latest"]) == 0
    mgr = CheckpointManager(str(tmp_path / "evict" / "checkpoints"))
    assert mgr.latest_step() == 6
    mgr.close()


def test_cli_synthetic_val_split_gets_model_vocab(tmp_path):
    """--val-data synthetic must size the fake tokens to the MODEL's vocab (and honor
    --val-num-samples): an unforwarded vocab_size indexes past a small embed table,
    which gathers NaN-fill and poisons every val metric."""
    rc = main(BASE + [
        "--epochs", "1", "--logs", str(tmp_path), "--name", "val",
        "--val-data", "synthetic", "--val-num-samples", "32",
    ])
    assert rc == 0
    records = [json.loads(l) for l in open(tmp_path / "val" / "results.jsonl")]
    evals = [r for r in records if "val_loss" in r]
    assert evals and np.isfinite(evals[-1]["val_loss"])
    # 32 val samples -> mean retrieval rank can be at most 32
    assert evals[-1]["image_to_text_mean_rank"] <= 32


def test_cli_vclip_with_kl_annealing(tmp_path):
    rc = main(BASE + [
        "--epochs", "1", "--logs", str(tmp_path), "--name", "v",
        "--variational", "--kl-warmup-epochs", "2", "--mc-samples", "4",
    ])
    assert rc == 0
    records = [json.loads(l) for l in open(tmp_path / "v" / "results.jsonl")]
    assert np.isfinite(records[-1]["loss"])
    assert "mean_image_concentration" in records[-1]


def test_cli_reference_recipe_flags_accepted(tmp_path):
    """The reference shell recipes' flags (train_alignCLIP.sh) must parse and run."""
    rc = main(BASE + [
        "--epochs", "1", "--logs", str(tmp_path), "--name", "a",
        "--clip-inModality-loss", "--alpha", "1", "--beta", "0.5",
        "--local-loss", "--gather-with-grad", "--horovod", "--ddp-static-graph",
    ])
    assert rc == 0
    params_txt = (tmp_path / "a" / "params.txt").read_text()
    assert "loss: align" in params_txt


def test_evaluate_clip_metrics():
    import jax.numpy as jnp

    from multimodal_tpu.data import DataInfo, SyntheticBatches
    from multimodal_tpu.models import create_model, init_params

    model = create_model("tiny-test")
    params = init_params(model)
    src = SyntheticBatches(batch_size=8, num_samples=16, image_size=model.cfg.vision.image_size,
                           context_length=model.cfg.text.context_length,
                           vocab_size=model.cfg.text.vocab_size)

    class Args:
        pass

    metrics = evaluate(model, params, DataInfo(src), None, epoch=0, args=Args())
    assert "image_to_text_R@1" in metrics and "text_to_image_mean_rank" in metrics
    assert np.isfinite(metrics["val_loss"])
    # uniformity + modality-gap probes (metrics.ipynb cells 25-26)
    assert 0.0 < metrics["knn_angle_image"] < 180.0
    assert 0.0 <= metrics["modality_separability"] <= 1.0


def test_evaluate_variational_uses_means():
    import jax.numpy as jnp

    from multimodal_tpu.data import DataInfo, SyntheticBatches
    from multimodal_tpu.models import create_model, init_params

    model = create_model("tiny-test", variational=True)
    params = init_params(model)
    src = SyntheticBatches(batch_size=8, num_samples=16,
                           image_size=model.cfg.vision.image_size,
                           context_length=model.cfg.text.context_length,
                           vocab_size=model.cfg.text.vocab_size)

    class Args:
        pass

    metrics = evaluate(model, params, DataInfo(src), None, epoch=0, args=Args())
    assert "image_to_text_R@1" in metrics and np.isfinite(metrics["val_loss"])


def test_full_reference_flag_surface_parses():
    """Every flag name the reference's main/params.py defines must be accepted
    (values routed to our equivalents or documented no-ops)."""
    from multimodal_tpu.train.params import parse_args

    ns = parse_args([
        "--clip-loss", "--skip-scheduler", "--copy-codebase", "--force-quick-gelu",
        "--force-custom-text", "--use-bn-sync", "--pretrained-image",
        "--use-bnb-linear", "int8",
        "--lock-image", "--lock-image-unlocked-groups", "2", "--lock-image-freeze-bn-stats",
        "--lock-text", "--lock-text-unlocked-layers", "1", "--lock-text-freeze-layer-norm",
        "--remote-sync-protocol", "fsspec",
        "--imagenet-sketch", "/d/sk", "--flowers-102", "/d/fl", "--food-101", "/d/fo",
        "--stanford", "/d/ca", "--ms-coco", "/d/coco", "--ms-coco-annot", "/d/ann.json",
        "--flickr", "/d/flk", "--flickr-annot", "/d/tok",
        "--imagenet-train", "/d/in-train",
    ])
    assert ns.loss == "clip" and ns.skip_scheduler and ns.copy_codebase
    assert ns.force_quick_gelu and ns.lock_image_unlocked_groups == 2
    assert ns.lock_text_unlocked_layers == 1 and ns.lock_text_freeze_layer_norm
    # aliases land in the canonical destinations
    assert ns.imagenet_s == "/d/sk" and ns.flowers == "/d/fl" and ns.food == "/d/fo"
    assert ns.stanford_cars == "/d/ca" and ns.coco_retrieval == "/d/coco"
    assert ns.flickr_retrieval == "/d/flk" and ns.flickr_annot == "/d/tok"
    assert ns.linear_probe_train == "/d/in-train" and ns.ms_coco_annot == "/d/ann.json"


def test_partial_tower_unlocking_mask():
    """--lock-image-unlocked-groups leaves only the tail blocks + post-norm/proj trainable."""
    import jax
    from multimodal_tpu.models import create_model, init_params
    from multimodal_tpu.train.run import _freeze_mask

    model = create_model("tiny-test")
    params = init_params(model)
    _, mask = _freeze_mask(params, lock_image=True, lock_text=False,
                           unlocked_image_groups=1)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): v
        for path, v in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    vis = {n: v for n, v in flat.items() if "visual" in n}
    depth = max(int(n.split("resblock_")[1].split("/")[0])
                for n in vis if "resblock_" in n)
    for name, trainable in vis.items():
        if f"resblock_{depth}" in name or "ln_post" in name or "projection" in name:
            assert trainable, name
        else:
            assert not trainable, name
    # text tower untouched
    assert all(v for n, v in flat.items() if "text" in n and "logit" not in n)


def test_skip_scheduler_constant_lr(tmp_path):
    rc = main(BASE + ["--epochs", "1", "--logs", str(tmp_path), "--name", "s",
                      "--skip-scheduler", "--lr", "1e-4", "--copy-codebase"])
    assert rc == 0
    assert (tmp_path / "s" / "code" / "multimodal_tpu" / "train" / "run.py").exists()


def test_force_quick_gelu_and_gelu_configs_differ():
    import jax.numpy as jnp
    import numpy as np
    import json
    import os

    from multimodal_tpu.models import create_model, init_params
    from multimodal_tpu.models.config import _CONFIG_DIR, add_model_config

    with open(os.path.join(_CONFIG_DIR, "tiny-test.json")) as f:
        raw = json.load(f)
    add_model_config("tiny-gelu", {**raw, "act": "gelu"})
    m_q = create_model("tiny-gelu", force_quick_gelu=True)
    m_g = create_model("tiny-gelu")
    assert m_q.cfg.act == "quick_gelu" and m_g.cfg.act == "gelu"
    params = init_params(m_q)
    from multimodal_tpu.models.factory import example_inputs
    img, txt = example_inputs(m_q.cfg)
    out_q = m_q.apply(params, img, txt)
    out_g = m_g.apply(params, img, txt)  # same tree shape, different activation
    assert not np.allclose(np.asarray(out_q["image_features"], np.float32),
                           np.asarray(out_g["image_features"], np.float32))
    assert bool(jnp.all(jnp.isfinite(out_g["image_features"])))


def test_finetune_freeze_modes(tmp_path):
    """--train-projections-only trains only projections; backbone params stay fixed."""
    import jax
    import numpy as np
    from multimodal_tpu.train.run import _finetune_mask
    from multimodal_tpu.models import create_model, init_params

    model = create_model("tiny-test")
    params = init_params(model)
    _, mask = _finetune_mask(params, "projections")
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in p): v
        for p, v in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    trainables = [n for n, v in flat.items() if v]
    assert set(trainables) == {
        "params/visual_projection", "params/text_projection", "params/logit_scale"
    }, trainables

    # end-to-end: a short run with the flag leaves backbone weights bit-identical
    rc = main(BASE + ["--epochs", "1", "--logs", str(tmp_path), "--name", "fp",
                      "--train-projections-only"])
    assert rc == 0


def test_variational_freeze_backbone_mask():
    import jax
    from multimodal_tpu.train.run import _finetune_mask
    from multimodal_tpu.models import create_model, init_params

    model = create_model("tiny-test", variational=True)
    params = init_params(model)
    _, mask = _finetune_mask(params, "heads")
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in p): v
        for p, v in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    trainables = {n for n, v in flat.items() if v}
    assert any("mean_image_projection" in n for n in trainables)
    assert any("extra_embedding" in n for n in trainables)
    assert any("log_concentration_scale" in n for n in trainables)
    assert not any("resblock" in n for n in trainables)
    assert not any("patch_conv" in n for n in trainables)


def test_cli_ring_step_matches_dense(tmp_path):
    """--contrastive-impl ring must actually take effect in a production run: the
    run.py-built step (use_shard_map auto-resolves on) computes the ring-streamed loss,
    which is exact — one step must match the dense GSPMD step bit-for-bit-ish."""
    import jax
    import jax.numpy as jnp

    from multimodal_tpu.models import create_model, init_params
    from multimodal_tpu.parallel import create_mesh, replicated_sharding, shard_batch
    from multimodal_tpu.train.engine import TrainState
    from multimodal_tpu.train.optimizer import make_optimizer
    from multimodal_tpu.train.params import parse_args
    from multimodal_tpu.train.run import build_train_step

    mesh = create_mesh()
    model = create_model("tiny-test")
    params = init_params(model)
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    c = model.cfg
    batch = shard_batch(
        {
            "image": np.asarray(jax.random.normal(
                k1, (16, c.vision.image_size, c.vision.image_size, 3))),
            "text": np.asarray(jax.random.randint(
                k2, (16, c.text.context_length), 1, c.text.vocab_size - 1)),
        },
        mesh,
    )

    def one_step(extra):
        args = parse_args(BASE + ["--epochs", "1", "--logs", str(tmp_path)] + extra)
        assert args.use_shard_map == ("ring" in extra)
        tx = make_optimizer(1e-3)
        # fresh copies: the production step donates its state, and device_put of an
        # already-placed tree aliases rather than copies
        fresh = jax.tree_util.tree_map(jnp.array, params)
        state = jax.device_put(TrainState.create(fresh, tx), replicated_sharding(mesh))
        step = build_train_step(args, model, tx, mesh)
        _, metrics = step(state, batch, jax.random.PRNGKey(1))
        return float(metrics["loss"])

    dense = one_step([])
    ring = one_step(["--contrastive-impl", "ring"])
    np.testing.assert_allclose(ring, dense, rtol=1e-5)


def test_cli_ring_rejects_shard_map_off():
    from multimodal_tpu.train.params import parse_args

    with pytest.raises(SystemExit):
        parse_args(BASE + ["--contrastive-impl", "ring", "--use-shard-map", "off"])
    with pytest.raises(SystemExit):
        parse_args(BASE + ["--use-shard-map", "on", "--tensor-parallel", "2"])


def test_cli_train_ring_end_to_end(tmp_path):
    """Full synthetic CLI run with the ring loss over the 8-way mesh."""
    rc = main(BASE + [
        "--epochs", "1", "--logs", str(tmp_path), "--name", "ring",
        "--contrastive-impl", "ring", "--label-smoothing", "0.1",
    ])
    assert rc == 0
    records = [json.loads(l) for l in open(tmp_path / "ring" / "results.jsonl")]
    assert np.isfinite(records[-1]["loss"])
