"""Flagship end-to-end demo: ONE command that trains a real-input model and runs the
ENTIRE eval battery from that single checkpoint.

This is the reference's metrics.ipynb full pass (cells 12-26: zero-shot, retrieval,
linear probe, separability, k-NN entropy, captioning BLEU) plus the training run that
produces the checkpoint (AlignCLIP/main/train.py:241-335), composed as one reproducible
pipeline over the compositional shapes webdataset:

  1. generate the shapes webdataset if absent (scripts/make_shapes_dataset.py);
  2. train through the FULL production input path (native tar index + JPEG decode + BPE,
     uint8 wire, prefetch, jitted sharded step) with per-epoch checkpoints;
  3. reload the final checkpoint and evaluate EVERYTHING:
     zero-shot (80 OpenAI templates, all 72 classes + the held-out-only subset),
     retrieval R@{1,5,10} both directions + mean/median rank,
     linear probe on frozen features, modality linear separability,
     k-NN angle entropy, and captioning BLEU from a CLIP-prefix decoder.

Results land in <logs>/<name>/demo_results.json and print as one JSON line each.

Usage:
  python scripts/flagship_demo.py [--model ViT-B-16] [--data /tmp/shapes]
      [--epochs 5] [--batch-size 256] [--logs /tmp/flagship]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_dataset(data: str, train_n: int, val_n: int):
    if os.path.exists(os.path.join(data, "classes.json")):
        return
    subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "make_shapes_dataset.py"),
         "--out", data, "--train", str(train_n), "--val", str(val_n)],
        check=True,
    )


def shard_pattern(data: str, split: str) -> str:
    import glob

    shards = sorted(glob.glob(os.path.join(data, f"{split}-*.tar")))
    last = len(shards) - 1
    return os.path.join(data, f"{split}-{{000000..{last:06d}}}.tar")


def read_val_samples(data: str, limit: int | None = None):
    """(jpeg bytes, caption) pairs from the val shards."""
    import glob

    from multimodal_tpu.data.wds import iter_tar_samples

    out = []
    for shard in sorted(glob.glob(os.path.join(data, "val-*.tar"))):
        for s in iter_tar_samples(shard):
            img = s.get("jpg") or s.get("jpeg")
            txt = (s.get("txt") or b"").decode("utf-8", "replace")
            if img and txt:
                out.append((img, txt))
            if limit and len(out) >= limit:
                return out
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model", default="ViT-B-16")
    p.add_argument("--data", default="/tmp/shapes")
    p.add_argument("--logs", default="/tmp/flagship")
    p.add_argument("--name", default="flagship-demo")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--train-samples", type=int, default=16384)
    p.add_argument("--val-samples", type=int, default=1024)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--wire-size", type=int, default=None,
                   help="host-side decode resolution (device upsamples to model size)")
    p.add_argument("--skip-train", action="store_true",
                   help="evaluate an existing <logs>/<name> checkpoint only")
    args = p.parse_args(argv)

    ensure_dataset(args.data, args.train_samples, args.val_samples)
    t_train0 = time.time()
    if not args.skip_train:
        cmd = [sys.executable, "-m", "multimodal_tpu.train.run",
               "--model", args.model, "--dataset-type", "webdataset",
               "--train-data", shard_pattern(args.data, "train"),
               "--val-data", shard_pattern(args.data, "val"),
               "--train-num-samples", str(args.train_samples),
               "--val-num-samples", str(args.val_samples),
               "--epochs", str(args.epochs), "--batch-size", str(args.batch_size),
               "--warmup", "100", "--lr", str(args.lr), "--wd", "0.05",
               "--workers", "1", "--report-to", "none",
               "--logs", args.logs, "--name", args.name,
               "--log-every-n-steps", "16"]
        if args.wire_size:
            cmd += ["--wire-size", str(args.wire_size)]
        print("[demo] train:", " ".join(cmd), file=sys.stderr, flush=True)
        env = dict(os.environ)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        subprocess.run(cmd, check=True, env=env)
    train_s = time.time() - t_train0

    # ---------------------------------------------------------------- reload
    import jax

    from multimodal_tpu.models import create_model, init_params
    from multimodal_tpu.train import TrainState, make_optimizer
    from multimodal_tpu.train.checkpoints import CheckpointManager

    model = create_model(args.model)
    tx = make_optimizer(args.lr)
    template = jax.device_get(TrainState.create(init_params(model), tx))
    ckpt = CheckpointManager(os.path.join(args.logs, args.name, "checkpoints"))
    restored, _meta = ckpt.restore(template)
    params = restored.params
    step = int(np.asarray(restored.step))
    results = {"model": args.model, "checkpoint_step": step,
               "train_wall_s": round(train_s, 1)}
    emit = lambda **kw: print(json.dumps(kw), flush=True)  # noqa: E731
    emit(stage="checkpoint", step=step, train_wall_s=results["train_wall_s"])

    from multimodal_tpu.inference import Embedder

    emb = Embedder(model, params, batch_size=args.batch_size)
    size = model.cfg.vision.image_size

    samples = read_val_samples(args.data)
    img_feats, ok = emb.embed_image_bytes([b for b, _ in samples], image_size=size)
    captions = [c for (_, c), k in zip(samples, ok) if k]
    img_feats = img_feats[np.asarray(ok, bool)]
    txt_feats = emb.embed_texts(captions)

    # ---------------------------------------------------------- zero-shot
    with open(os.path.join(args.data, "classes.json")) as f:
        cj = json.load(f)
    all_classes = sorted({c for c in captions})
    holdout = {f"a {c} {s} on a {b} background" for c, s, b in cj["holdout_classes"]}
    from multimodal_tpu.eval.metadata import templates
    from multimodal_tpu.eval.zero_shot import build_zero_shot_classifier

    tok_ctx = model.cfg.text.context_length
    classifier = build_zero_shot_classifier(
        emb.embed_tokens, all_classes, templates("openai"), context_length=tok_ctx)
    logits = img_feats @ np.asarray(classifier)
    targets = np.asarray([all_classes.index(c) for c in captions])
    top1 = float((logits.argmax(-1) == targets).mean())
    top5 = float(np.mean([t in row.argsort()[-5:] for row, t in zip(logits, targets)]))
    hold_mask = np.asarray([c in holdout for c in captions])
    hold_top1 = float((logits.argmax(-1) == targets)[hold_mask].mean())
    results.update(zeroshot_top1=top1, zeroshot_top5=top5,
                   zeroshot_holdout_top1=hold_top1,
                   zeroshot_classes=len(all_classes),
                   zeroshot_holdout_n=int(hold_mask.sum()))
    emit(stage="zero_shot", top1=top1, top5=top5, holdout_top1=hold_top1,
         classes=len(all_classes), chance=round(1 / len(all_classes), 4))

    # ---------------------------------------------------------- retrieval
    from multimodal_tpu.eval.retrieval import get_clip_metrics

    ret = get_clip_metrics(img_feats, txt_feats)
    ret = {k: (float(v) if np.isscalar(v) or getattr(v, "ndim", 1) == 0 else v)
           for k, v in ret.items()}
    results.update({f"retrieval_{k}": v for k, v in ret.items()})
    emit(stage="retrieval", **{k: round(v, 4) for k, v in ret.items()
                               if isinstance(v, float)})

    # ---------------------------------------------------------- linear probe
    from multimodal_tpu.eval.linear_probe import linear_probe_metrics

    n = len(img_feats)
    idx = np.random.default_rng(0).permutation(n)
    half = n // 2
    probe = linear_probe_metrics(
        img_feats[idx[:half]], targets[idx[:half]],
        img_feats[idx[half:]], targets[idx[half:]], num_classes=len(all_classes))
    results.update(probe)
    emit(stage="linear_probe", **{k: round(float(v), 4) for k, v in probe.items()})

    # ------------------------------------------- separability + entropy
    from multimodal_tpu.eval.entropy import entropy_metric
    from multimodal_tpu.eval.separability import linear_separability

    sep = float(linear_separability(img_feats, txt_feats))
    ent = {k: float(v) for k, v in entropy_metric(img_feats, txt_feats).items()}
    results.update(separability=sep, **{f"entropy_{k}": v for k, v in ent.items()})
    emit(stage="separability_entropy", separability=round(sep, 4),
         **{k: round(v, 4) for k, v in ent.items()})

    # ---------------------------------------------------------- captioning
    from multimodal_tpu.data.tokenizer import default_tokenizer
    from multimodal_tpu.eval.captioning import CaptioningMetric
    from multimodal_tpu.models.captioner import ClipCaptionModel, GPT2Config

    tok = default_tokenizer()
    sot, eot = tok.sot_token_id, tok.eot_token_id
    n_eval = max(64, n // 10)
    tr, ev = idx[n_eval:], idx[:n_eval]
    cap_model = ClipCaptionModel(
        gpt2=GPT2Config(vocab_size=49408, max_positions=128, width=256, layers=4,
                        heads=4),
        clip_dim=model.cfg.embed_dim, prefix_length=10, clip_length=4, mapper_layers=2)
    metric = CaptioningMetric(
        caption_model=cap_model,
        detokenizer=lambda ids: tok.decode(
            [i for i in ids if i not in (sot, eot)]).strip(),
        epochs=3, batch_size=32, lr=2e-4, seed=0, eos_token=eot)
    cap_list = list(captions)
    bleu, info = metric.compute(
        img_feats[tr], np.asarray(tok([cap_list[i] for i in tr])),
        img_feats[ev], [cap_list[i] for i in ev])
    results.update(caption_bleu=float(bleu), caption_num_eval=info["num_eval"])
    emit(stage="captioning", bleu=round(float(bleu), 4), num_eval=info["num_eval"])

    out_path = os.path.join(args.logs, args.name, "demo_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, default=float)
    emit(stage="done", results=out_path)
    return results


if __name__ == "__main__":
    main()
