"""Train/eval CLI entry point: ``python -m multimodal_tpu.train.run --train-data ...``.

Counterpart of reference AlignCLIP/main/run.py:77-465 — the orchestration spine:
parse args -> (multi-host init) -> experiment dir + logging -> model factory -> optimizer
with wd-exclusion -> data -> LR schedule -> resume -> epoch loop {train_one_epoch, evaluate,
checkpoint save/rotate} -> final sync. TPU redesign: a single jitted sharded train step per
epoch loop (engine.py) instead of per-batch Python; Orbax checkpoints; the synthetic backend
exercises the whole loop with no data (run.py:276, data.py:582)."""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
import threading
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

# persistent XLA compilation cache: big-model Mosaic kernel compiles run ~20 min cold
# (e.g. the head-80 block-attention kernel at ViT-H/14 widths); caching them on disk
# makes every run after the first start in seconds. Opt out with
# JAX_COMPILATION_CACHE_DIR="" (same knob bench.py uses).
_CACHE_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
if _CACHE_DIR:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)

from multimodal_tpu.data import DataInfo, build_dataset
from multimodal_tpu.models import create_model, init_params, param_count
from multimodal_tpu.models.config import VariationalConfig
from multimodal_tpu.parallel import create_mesh, data_sharding, replicated_sharding
from multimodal_tpu.train.checkpoints import CheckpointManager
from multimodal_tpu.train.engine import TrainState, make_train_step
from multimodal_tpu.train.logging_utils import (
    AverageMeter,
    ExperimentLogger,
    ThroughputMeter,
    setup_logging,
)
from multimodal_tpu.train.optimizer import make_optimizer
from multimodal_tpu.train.params import parse_args
from multimodal_tpu.train.schedules import make_schedule

log = logging.getLogger(__name__)

# preemption flag: set by SIGTERM (the cloud TPU-pod eviction signal); the train loop
# checks it after every step and checkpoints + exits cleanly (beyond reference)
_PREEMPTED = threading.Event()


def _install_preemption_handler():
    import signal

    def _on_sigterm(signum, frame):
        _PREEMPTED.set()

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:  # not the main thread (e.g. main() called from a test runner)
        log.warning("not in main thread; SIGTERM preemption handler not installed")


def _preemption_stop(args) -> bool:
    """Has ANY host been preempted?

    Single-host: the local SIGTERM flag. Multihost: SIGTERM lands per-host
    (uncoordinated), and a per-host reactive stop would desynchronize the collective
    program — the evicted host would enter the checkpoint save / break its loop while
    the others keep stepping. So the flag is max-reduced across processes at every step
    boundary (a one-int32 process_allgather, microseconds over ICI vs a multi-ms train
    step): every host agrees to stop at the SAME step, saves the same checkpoint, and
    exits within the eviction grace period. The local flag is set when the global answer
    is yes, so all downstream logic (epoch-end save, clean break) is uniform across
    hosts. TPU-pod preemption model per SURVEY §5; single-host semantics unchanged."""
    if not (getattr(args, "multihost", False) and args.save_on_preemption):
        return _PREEMPTED.is_set()
    from jax.experimental import multihost_utils

    flag = np.int32(1 if _PREEMPTED.is_set() else 0)
    stop = bool(multihost_utils.process_allgather(flag).max())
    if stop:
        _PREEMPTED.set()
    return stop


def _loss_kwargs(args) -> dict:
    if args.loss == "clip":
        return {
            "label_smoothing": args.label_smoothing,
            "local_loss": args.local_loss,
            "contrastive_impl": args.contrastive_impl,
            "chunk_size": args.contrastive_chunk_size,
        }
    if args.loss == "cloob":
        return {"inv_tau": args.inv_tau, "scale_hopfield": args.scale_hopfield}
    if args.loss == "align":
        return {
            "alpha": args.alpha,
            "beta": args.beta,
            "separate_text": args.separate_text,
            "separate_image": args.separate_image,
        }
    if args.loss == "vclip":
        return {
            "distribution_type": args.distribution_type,
            "kl_weight": args.kl_weight,
            "num_samples": args.mc_samples,
            "var_reg_weight": args.variance_reg_weight,
            "use_mean_only": args.use_mean_only,
        }
    if args.loss == "siglip":
        return {}  # ring vs dense is decided by use_shard_map (the loss takes axis_name)
    raise ValueError(args.loss)


def _freeze_mask(params, lock_image: bool, lock_text: bool,
                 unlocked_image_groups: int = 0, unlocked_text_layers: int = 0,
                 freeze_layer_norm: bool = False):
    """optax.masked zero-update mask for locked towers (run.py:248-259 lock semantics).

    unlocked_image_groups / unlocked_text_layers leave the LAST N transformer blocks plus
    the post-norm and projection trainable (reference --lock-image-unlocked-groups /
    --lock-text-unlocked-layers); freeze_layer_norm keeps LayerNorm params inside those
    unlocked blocks frozen (--lock-text-freeze-layer-norm)."""
    import optax
    import re

    names = []
    jax.tree_util.tree_map_with_path(
        lambda p, _: names.append("/".join(str(getattr(k, "key", k)) for k in p)), params)

    def tower_depth(tower_tag: str) -> int:
        idxs = [int(m.group(1)) for n in names if tower_tag in n
                for m in re.finditer(r"resblock_(\d+)", n)]
        return max(idxs) + 1 if idxs else 0

    def unlocked(name: str, tower_tag: str, n_unlocked: int) -> bool:
        if n_unlocked <= 0:
            return False
        m = re.search(r"resblock_(\d+)", name)
        if m is not None:
            in_tail = int(m.group(1)) >= tower_depth(tower_tag) - n_unlocked
            if in_tail and freeze_layer_norm and ("ln_1" in name or "ln_2" in name):
                return False
            return in_tail
        # non-block params: post-norm + projection stay trainable when partially unlocked
        return any(t in name for t in ("ln_post", "ln_final", "projection"))

    def keep(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if lock_image and ("visual" in name):
            return unlocked(name, "visual", unlocked_image_groups)
        if lock_text and ("text" in name and "logit" not in name):
            return unlocked(name, "text", unlocked_text_layers)
        return True

    mask = jax.tree_util.tree_map_with_path(keep, params)
    return optax.masked, mask


def _finetune_mask(params, mode: str):
    """Masks for the reference's notebook-side freeze modes.

    mode='projections': train only the output projections + logit scale
    (Models/clipModel.py:37-42 freeze_for_finetuning — visual.proj/text_projection).
    mode='heads': train only the parameters a VariationalCLIP adds on top of a pretrained
    backbone — mean/var projections, concentration token + scale, final norms, logit scale
    (Models/variationalClip.py:204 freeze_backbone / trainer.ipynb FREEZE_BACKBONE).
    mode='lora': train only the low-rank adapter pairs + logit scale (--lora-rank,
    finetune.ipynb:cell 12 PEFT LoRA)."""
    import optax

    head_tags = {
        "projections": ("projection", "logit_scale"),
        "heads": ("projection", "logit_scale", "log_concentration", "extra_embedding",
                  "ln_post", "ln_final"),
        "lora": ("lora_a", "lora_b", "logit_scale"),
    }[mode]

    def keep(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        return any(t in name for t in head_tags)

    mask = jax.tree_util.tree_map_with_path(keep, params)
    return optax.masked, mask


def freeze_optimizer(tx, mask):
    """Freeze-mode optimizer assembly: the full optimizer runs under optax.masked on the
    trainable leaves only (the global grad-clip norm and non-finite skip see just those
    gradients — torch clip_grad_norm_ skips grad-None frozen params the same way, and no
    optimizer moments are allocated for frozen leaves, which for a LoRA finetune is the
    entire adapter-only memory benefit), chained with a masked set_to_zero that drops the
    raw gradients optax.masked would otherwise pass through to the frozen leaves."""
    import optax

    inv = jax.tree_util.tree_map(lambda m: not m, mask)
    return optax.chain(optax.masked(tx, mask), optax.masked(optax.set_to_zero(), inv))


def init_multihost(dist_url: str | None = None) -> None:
    """jax.distributed bootstrap (main/distributed.py:63-137 init_distributed_device):
    an explicit ``tcp://host:port`` coordinator with the reference's RANK/WORLD_SIZE env
    convention, or ``env://``/None for JAX's cluster auto-detection (TPU pods, SLURM)."""
    kw = {}
    if dist_url and dist_url != "env://":
        addr = dist_url[len("tcp://"):] if dist_url.startswith("tcp://") else dist_url
        kw = dict(
            coordinator_address=addr,
            num_processes=int(os.environ.get("WORLD_SIZE", "1")),
            process_id=int(os.environ.get("RANK", "0")),
        )
    jax.distributed.initialize(**kw)


def resolve_experiment_name(args, num_hosts: int) -> str:
    """Rank-0 decides the timestamped name, every host agrees (run.py:96-98
    broadcast_object -> multihost_utils.broadcast_one_to_all)."""
    if args.name is not None:
        return args.name
    date_str = datetime.now().strftime("%Y_%m_%d-%H_%M_%S")
    if num_hosts > 1:
        from jax.experimental import multihost_utils

        date_str = multihost_utils.broadcast_one_to_all(
            np.frombuffer(date_str.encode().ljust(32), dtype=np.uint8)
        ).tobytes().decode().strip()
    return f"{args.model}-{args.loss}-{date_str}"


def build_train_step(args, model, tx, mesh, state_shardings=None, epoch: int = 0):
    """The production step builder: resolves per-epoch loss kwargs (KL annealing, the
    riemannian flip) and the shard_map mode from the parsed CLI args. Module-level so
    tests can build the exact step a real run uses."""
    kw = _loss_kwargs(args)
    if args.loss == "vclip":
        if args.kl_warmup_epochs:
            kw = dict(kw, kl_weight=kl_schedule(epoch, args.kl_weight,
                                                args.kl_warmup_epochs))
        # Riemannian mean-grad projection after KL warmup completes
        # (trainer.ipynb train_epoch: epoch > NUM_EPOCHS_TO_FULL_KL)
        if args.distribution_type != "normal":
            kw = dict(kw, riemannian=epoch > args.kl_warmup_epochs)
    return make_train_step(
        model, tx, loss_type=args.loss, loss_kwargs=kw, mesh=mesh,
        use_shard_map=args.use_shard_map,
        accum_steps=args.accum_freq, feature_cached_accum=args.feature_cached_accum,
        donate=True, state_shardings=state_shardings,
        ema_decay=args.model_ema_decay if args.model_ema else None,
        offload_opt_state=getattr(args, "opt_state_offload", False),
        wire_size=args.wire_size,
    )


def kl_schedule(epoch: int, kl_weight: float, warmup_epochs: int) -> float:
    """Staged KL annealing (trainer.ipynb kl_schedule, NUM_EPOCHS_TO_FULL_KL semantics):
    ZERO for the first warmup_epochs-1 epochs — vclip_loss then falls back to mean-point
    InfoNCE, so contrastive structure forms before any sampling noise — then a linear ramp
    from kl_weight/2 to kl_weight by epoch 2*warmup_epochs. This phase ordering (means
    first, sampling+KL second, riemannian hook after) is what keeps MC-sampled
    concentrations off the clamp floor."""
    if warmup_epochs <= 0:
        return kl_weight
    e = epoch + 1
    if e < warmup_epochs:
        return 0.0
    if e >= 2 * warmup_epochs:
        return kl_weight
    return kl_weight * e / (2.0 * warmup_epochs)


def _start_remote_sync(local_dir: str, remote_dir: str, frequency_s: int) -> threading.Event:
    """Background checkpoint sync every N seconds (file_utils.py:13-64). Local/posix targets
    use a plain recursive copy; stop via the returned event."""
    stop = threading.Event()

    def loop():
        while not stop.wait(frequency_s):
            try:
                subprocess.run(
                    ["rsync" if shutil.which("rsync") else "cp", "-r", local_dir, remote_dir],
                    check=False,
                    capture_output=True,
                    timeout=600,
                )
            except Exception as e:  # noqa: BLE001
                log.warning("remote sync failed: %r", e)

    threading.Thread(target=loop, daemon=True).start()
    return stop


def evaluate(model, params, data_val, mesh, epoch: int, args) -> dict:
    """Validation: paired CLIP metrics over the val set (train.py:241-356)."""
    from multimodal_tpu.eval.retrieval import get_clip_metrics
    from multimodal_tpu.train.engine import batch_images

    @jax.jit
    def encode(params, batch):
        out = model.apply(
            params, batch_images(batch, model, getattr(args, "wire_size", None)),
            batch["text"])
        if "image_features" in out:
            fi, ft = out["image_features"], out["text_features"]
        else:  # variational heads: normalized means as point estimates
            # (metrics-vclip.ipynb's power_spherical_mean usage)
            fi, ft = out["image_mean"], out["text_mean"]
        fi = fi / jnp.linalg.norm(fi, axis=-1, keepdims=True)
        ft = ft / jnp.linalg.norm(ft, axis=-1, keepdims=True)
        return fi, ft, out["logit_scale"]

    feats_i, feats_t, ls = [], [], 1.0
    for batch in data_val:
        fi, ft, ls = encode(params, batch)
        feats_i.append(np.asarray(fi))
        feats_t.append(np.asarray(ft))
    if not feats_i:
        return {}
    fi, ft = np.concatenate(feats_i), np.concatenate(feats_t)
    metrics = get_clip_metrics(fi, ft, float(jnp.exp(jnp.asarray(ls))))
    # whole-val-set contrastive loss (train.py:300-325's cumulative val loss); a model
    # with a SigLIP head is scored with its own pairwise-sigmoid loss for consistency
    # (detect via the config, same source of truth as the engine's loss dispatch)
    lb = (params["params"]["logit_bias"]
          if getattr(getattr(model, "cfg", None), "logit_bias_init", None) is not None
          else None)
    if lb is not None:
        from multimodal_tpu.losses import siglip_loss

        metrics["val_loss"] = float(siglip_loss(
            jnp.asarray(fi), jnp.asarray(ft), jnp.asarray(ls), jnp.asarray(lb),
            normalize=False,
        ))
    else:
        from multimodal_tpu.losses import clip_loss

        metrics["val_loss"] = float(
            clip_loss(jnp.asarray(fi), jnp.asarray(ft), jnp.asarray(ls), normalize=False)
        )
    # representation-quality probes (metrics.ipynb cells 25-26): k-NN-angle uniformity and
    # the image-vs-text linear-separability modality-gap measure
    if len(fi) >= 16:
        from multimodal_tpu.eval.entropy import average_kth_neighbor_angle
        from multimodal_tpu.eval.separability import linear_separability

        metrics["knn_angle_image"] = float(average_kth_neighbor_angle(fi))
        metrics["knn_angle_text"] = float(average_kth_neighbor_angle(ft))
        metrics["modality_separability"] = float(
            linear_separability(fi, ft, epochs=200)
        )
    metrics["epoch"] = epoch
    return metrics


ZERO_SHOT_DATASETS = {  # CLI flag -> metadata class-table key (zero_shot.py:65-84)
    "imagenet_val": "imagenet",
    "imagenet_v2": "imagenet-v2",
    "imagenet_s": "imagenet-sketch",
    "imagenet_a": "imagenet-a",
    "imagenet_o": "imagenet-o",
    "imagenet_r": "imagenet-r",
    "imagenet_c": "imagenet",  # corruption set shares the ImageNet tables (zero_shot.py:118)
    "cifar10": "cifar10",
    "cifar100": "cifar100",
    "flowers": "flowers102",
    "food": "food101",
    "stanford_cars": "stanford-cars",
}


def zero_shot_eval_all(model, params, args, mesh=None) -> dict:
    """Zero-shot classification over every eval set whose path flag is given
    (main/zero_shot.py:51-146: build template-averaged classifier, batched top-1/5).
    Paths in the stock torchvision archive layouts (CIFAR pickle batches, Food-101,
    Flowers-102 .mat, Stanford Cars devkit — main/data.py:123-257) are read natively;
    anything else is treated as folder-per-class."""
    from multimodal_tpu.data.eval_sets import open_eval_dataset
    from multimodal_tpu.eval.metadata import classnames, templates
    from multimodal_tpu.eval.zero_shot import build_zero_shot_classifier, zero_shot_eval
    from multimodal_tpu.train.engine import batch_images

    if getattr(args, "variational", False):  # variational heads have no point encoder
        return {}
    active = {k: getattr(args, k) for k in ZERO_SHOT_DATASETS if getattr(args, k, None)}
    if not active:
        return {}

    @jax.jit
    def encode_text(tokens):
        return model.apply(params, tokens, normalize=True, method=model.encode_text)

    @jax.jit
    def encode_image(images):
        return model.apply(
            params, batch_images({"image": images}), normalize=True,
            method=model.encode_image,
        )

    results = {}
    tmpl = templates("openai")
    for flag, meta_key in ZERO_SHOT_DATASETS.items():
        path = active.get(flag)
        if not path:
            continue
        ds = open_eval_dataset(flag, path, batch_size=args.batch_size,
                               image_size=model.cfg.vision.image_size)
        try:
            names = classnames(meta_key)
            if len(names) != len(ds.classes):  # folder set != canonical table
                names = [c.replace("_", " ") for c in ds.classes]
        except KeyError:
            names = [c.replace("_", " ") for c in ds.classes]
        classifier = build_zero_shot_classifier(
            encode_text, names, tmpl, context_length=model.cfg.text.context_length
        )
        acc = zero_shot_eval(encode_image, classifier, iter(ds))
        results[f"{flag}-zeroshot-top1"] = acc["top1"]
        results[f"{flag}-zeroshot-top5"] = acc["top5"]
        log.info("zero-shot %s: top1 %.4f top5 %.4f", flag, acc["top1"], acc["top5"])
    return results


def retrieval_eval_all(model, params, args) -> dict:
    """COCO/Flickr cross-modal retrieval (main/retrieval.py:7-102): encode every image and
    all its captions (COCO ships ~5 per image), dense text@image.T, R@{1,5,10} both ways."""
    from multimodal_tpu.data.datasets import coco_captions, flickr_items
    from multimodal_tpu.eval.retrieval import recall_at_k
    from multimodal_tpu.inference import Embedder

    if getattr(args, "variational", False):
        return {}
    results = {}
    loaders = [
        ("coco_retrieval", lambda root: coco_captions(
            root, split="val", ann_path=getattr(args, "ms_coco_annot", None))),
        ("flickr_retrieval", lambda root: flickr_items(
            root, token_path=getattr(args, "flickr_annot", None))),
    ]
    for flag, loader in loaders:
        root = getattr(args, flag, None)
        if not root:
            continue
        items = loader(root)
        # group captions by image path (retrieval.py:7-52's index maps)
        by_image: dict = {}
        for path, caption in items:
            by_image.setdefault(path, []).append(caption)
        image_paths = list(by_image)
        captions, text_to_image = [], []
        for i, p in enumerate(image_paths):
            for c in by_image[p]:
                captions.append(c)
                text_to_image.append(i)
        emb = Embedder(model, params, batch_size=args.batch_size)
        img_feats, ok = emb.embed_image_files(image_paths,
                                              image_size=model.cfg.vision.image_size)
        txt_feats = emb.embed_texts(captions)
        r = recall_at_k(img_feats, txt_feats, np.asarray(text_to_image))
        results.update({f"{flag}-{k}": v for k, v in r.items()})
        log.info("retrieval %s: %s", flag, r)
    return results


def captioning_eval(model, params, args) -> dict:
    """Downstream captioning eval, CLI-reachable (metrics.ipynb cells 15-21 /
    metrics/captioning.py:14,234-331): embed images with the frozen encoder, train a
    CLIP-prefix caption decoder on 90% of them, generate on the held-out 10%, report
    corpus BLEU. Deviation from the reference, documented: the decoder is a compact
    from-scratch GPT-2 (training pods are zero-egress, no pretrained GPT-2 snapshot);
    it measures encoder quality the same way — captions are only learnable from the
    image embedding."""
    root = getattr(args, "captioning_eval", None)
    if not root or getattr(args, "variational", False):
        return {}
    from multimodal_tpu.data.datasets import coco_captions, cood_items
    from multimodal_tpu.data.tokenizer import default_tokenizer
    from multimodal_tpu.eval.captioning import CaptioningMetric
    from multimodal_tpu.inference import Embedder
    from multimodal_tpu.models.captioner import ClipCaptionModel, GPT2Config

    try:
        items = coco_captions(root, split="val",
                              ann_path=getattr(args, "ms_coco_annot", None))
    except (FileNotFoundError, NotADirectoryError, OSError, ValueError):
        items = cood_items(root)  # folder-per-class fallback (caption = class name)
    one_per_image: dict = {}
    for path, caption in items:
        one_per_image.setdefault(path, caption)
    items = list(one_per_image.items())
    rng = np.random.default_rng(args.seed)
    rng.shuffle(items)
    items = items[: args.captioning_num_samples]
    if len(items) < 20:
        log.warning("captioning eval: only %d usable images; skipping", len(items))
        return {}
    n_eval = max(8, len(items) // 10)
    train_items, eval_items = items[n_eval:], items[:n_eval]

    emb = Embedder(model, params, batch_size=args.batch_size)
    size = model.cfg.vision.image_size
    train_feats, _ = emb.embed_image_files([p for p, _ in train_items], image_size=size)
    eval_feats, _ = emb.embed_image_files([p for p, _ in eval_items], image_size=size)

    tok = default_tokenizer()
    sot, eot = tok.sot_token_id, tok.eot_token_id
    train_tokens = tok([c for _, c in train_items])
    caption_model = ClipCaptionModel(
        gpt2=GPT2Config(vocab_size=49408, max_positions=128,
                        width=args.captioning_width, layers=args.captioning_layers,
                        heads=max(2, args.captioning_width // 64)),
        clip_dim=model.cfg.embed_dim, prefix_length=10, clip_length=4, mapper_layers=2,
    )
    metric = CaptioningMetric(
        caption_model=caption_model,
        detokenizer=lambda ids: tok.decode(
            [i for i in ids if i not in (sot, eot)]).strip(),
        epochs=args.captioning_epochs, batch_size=min(32, len(train_items)),
        lr=2e-4, seed=args.seed,
        eos_token=eot,  # CLIP-BPE EOT — without it generation never terminates
    )
    bleu, info = metric.compute(
        np.asarray(train_feats), np.asarray(train_tokens), np.asarray(eval_feats),
        [c for _, c in eval_items],
    )
    log.info("captioning eval: BLEU %.4f over %d held-out images", bleu, info["num_eval"])
    return {"caption_bleu": bleu, "caption_num_eval": info["num_eval"]}


def linear_probe_eval(model, params, args) -> dict:
    """Linear probing on frozen image features (main/linear_probing.py:20-114): embed a
    folder-per-class train/val pair, fit the logistic head, report accuracy."""
    if getattr(args, "variational", False) or not getattr(args, "linear_probe_train", None):
        return {}
    from multimodal_tpu.data.eval_sets import open_eval_dataset
    from multimodal_tpu.eval.linear_probe import linear_probe_metrics
    from multimodal_tpu.inference import Embedder

    emb = Embedder(model, params, batch_size=args.batch_size)

    def featurize(root, split):
        ds = open_eval_dataset("linear_probe", root, batch_size=args.batch_size,
                               image_size=model.cfg.vision.image_size, split=split)
        feats, labels = [], []
        for images, lab in ds:
            feats.append(emb.embed_images(images))
            labels.append(lab)
        return np.concatenate(feats), np.concatenate(labels), len(ds.classes)

    xtr, ytr, n_classes = featurize(args.linear_probe_train, "train")
    xte, yte, _ = featurize(args.linear_probe_val or args.linear_probe_train, "test")
    metrics = linear_probe_metrics(xtr, ytr, xte, yte, n_classes,
                                   epochs=args.linear_probe_epochs)
    log.info("linear probe: %s", metrics)
    return metrics


def train_one_epoch(step_fn, state, data_train, epoch, args, exp_logger, num_devices,
                    rng, ckpt=None, skip_steps: int = 0) -> tuple:
    """Inner loop (train.py:65-239): iterate prefetched device batches through the jitted
    step; meter batch/step time and samples/s; periodic logging.

    Beyond reference — preemption-safe mid-epoch checkpointing: with
    --save-frequency-steps N and a ``ckpt`` manager, the state is saved every N steps
    with mid_epoch metadata; on resume, ``skip_steps`` fast-forwards the (deterministic,
    set_epoch-seeded) data stream past the already-trained batches. The per-step rng is
    fold_in(fold_in(rng, epoch), i), so a resumed run replays the exact dropout/MC-sample
    stream of an uninterrupted one."""
    batch_time = AverageMeter()
    data_time = AverageMeter()
    tput = ThroughputMeter(num_devices)
    losses = {}
    end = time.perf_counter()
    step_in_epoch = 0
    metrics = {}
    profiling = args.profile_steps > 0 and epoch == 0
    if skip_steps:
        log.info("mid-epoch resume: fast-forwarding %d batches of epoch %d",
                 skip_steps, epoch)
    save_every = getattr(args, "save_frequency_steps", 0) or 0

    for i, batch in enumerate(data_train):
        if i < skip_steps:
            # the coordinated check runs here too: skip_steps is identical on every
            # host (same checkpoint metadata), so the collective call counts align
            if _preemption_stop(args):
                # evicted during the replay: state is unchanged since restore, so
                # nothing new to save — just exit cleanly within the grace period
                log.info("preemption during fast-forward; exiting (nothing to save)")
                return state, losses, 0, rng
            end = time.perf_counter()
            continue
        data_time.update(time.perf_counter() - end)
        if profiling and i == 1:
            jax.profiler.start_trace(os.path.join(args.log_dir, "profile"))
        sub = jax.random.fold_in(jax.random.fold_in(rng, epoch), i)
        state, metrics = step_fn(state, batch, sub)
        step_in_epoch += 1
        preempted = _preemption_stop(args) and ckpt is not None
        if ckpt is not None and ((save_every and (i + 1) % save_every == 0) or preempted):
            ckpt.save(int(jax.device_get(state.step)), jax.device_get(state),
                      metadata={"epoch": epoch, "name": args.name,
                                "mid_epoch": True, "step_in_epoch": i + 1})
        if preempted:
            log.info("preemption signal received: saved step %d (epoch %d, batch %d); "
                     "resume with --resume latest", int(jax.device_get(state.step)),
                     epoch, i + 1)
            break
        bsz = batch["text"].shape[0]
        tput.update(bsz)
        batch_time.update(time.perf_counter() - end)
        end = time.perf_counter()
        if profiling and i == 1 + args.profile_steps:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            profiling = False

        if (i + 1) % args.log_every_n_steps == 0:
            host_metrics = {k: float(v) for k, v in metrics.items() if jnp.ndim(v) == 0}
            rates = tput.rates()
            record = {
                "epoch": epoch,
                "step": int(jax.device_get(state.step)),
                "data_time": data_time.avg,
                "batch_time": batch_time.avg,
                **rates,
                **host_metrics,
            }
            log.info(
                "epoch %d step %d loss %.4f | %.1f samples/s (%.1f/device)",
                epoch, record["step"], record.get("loss", float("nan")),
                rates["samples_per_s"], rates["samples_per_s_per_device"],
            )
            exp_logger.log(record, step=record["step"])
            losses = host_metrics
            tput.reset()
    return state, losses, step_in_epoch, rng


def main(argv=None):
    args = parse_args(argv)

    _PREEMPTED.clear()
    if args.multihost:
        init_multihost(getattr(args, "dist_url", None))
    if args.save_on_preemption:
        # multihost: the per-host SIGTERM is coordinated by _preemption_stop's per-step
        # flag all-reduce — every host stops, saves, and exits at the same step boundary.
        # Installed AFTER jax.distributed.initialize: the TSL runtime registers its own
        # C-level SIGTERM notifier during initialize, and whichever handler is installed
        # last wins — installing first would leave the Python flag handler dead.
        _install_preemption_handler()
    host_id, num_hosts = jax.process_index(), jax.process_count()

    # experiment naming: rank-0 decides, all hosts agree (run.py:96-98 broadcast_object)
    args.name = resolve_experiment_name(args, num_hosts)
    args.log_dir = os.path.join(args.logs, args.name)
    os.makedirs(args.log_dir, exist_ok=True)
    if args.copy_codebase and host_id == 0:
        # snapshot the package next to the logs for exact reproducibility (run.py:468-486)
        import multimodal_tpu as _pkg
        import shutil

        dst = os.path.join(args.log_dir, "code", "multimodal_tpu")
        if not os.path.exists(dst):
            shutil.copytree(
                os.path.dirname(os.path.abspath(_pkg.__file__)), dst,
                ignore=shutil.ignore_patterns("__pycache__", "*.so", "*.o"),
            )

    setup_logging(
        os.path.join(args.log_dir, "out.log") if (host_id == 0 or args.log_local) else None,
        level=logging.DEBUG if args.debug else logging.INFO,
        rank=host_id,
    )
    # params.txt dump of the full config (run.py:265-270)
    if host_id == 0:
        with open(os.path.join(args.log_dir, "params.txt"), "w") as f:
            for k in sorted(vars(args)):
                f.write(f"{k}: {getattr(args, k)}\n")

    report_to = [r for r in args.report_to.split(",") if r]
    exp_logger = ExperimentLogger(
        args.log_dir,
        use_wandb="wandb" in report_to and host_id == 0,
        use_tensorboard="tensorboard" in report_to and host_id == 0,
        wandb_kwargs={"project": args.wandb_project_name, "notes": args.wandb_notes,
                      "config": vars(args), "name": args.name},
    )

    tp = max(args.tensor_parallel, 1)
    ep = max(args.expert_parallel, 1)
    num_devices = len(jax.devices())
    if tp > 1:
        from multimodal_tpu.parallel.tp import create_tp_mesh

        assert args.dcn_slices <= 1, "--tensor-parallel and --dcn-slices are exclusive"
        mesh = create_tp_mesh(num_devices // tp, tp)
    elif ep > 1:
        from multimodal_tpu.parallel.ep import create_ep_mesh

        assert args.dcn_slices <= 1, "--expert-parallel and --dcn-slices are exclusive"
        mesh = create_ep_mesh(num_devices // ep, ep)
    elif args.dcn_slices > 1:
        from multimodal_tpu.parallel import create_hybrid_mesh

        mesh = create_hybrid_mesh(args.dcn_slices)
    else:
        mesh = create_mesh()
    log.info("devices: %d x %s, hosts: %d, tensor-parallel: %d, dcn-slices: %d", num_devices,
             jax.devices()[0].device_kind, num_hosts, tp, max(args.dcn_slices, 1))

    # ------------------------------------------------------------------ model
    dtype = jnp.float32 if args.precision == "fp32" else jnp.bfloat16
    vcfg = VariationalConfig(
        model_type="Spherical" if args.distribution_type != "normal" else "Gaussian",
        initial_concentration=args.initial_concentration,
        min_concentration=args.min_concentration,
    ) if args.variational else None
    model = create_model(
        args.model, variational=args.variational, vcfg=vcfg, dtype=dtype,
        # --force-image-size REBUILDS the model at the forced resolution (reference
        # factory.py force_image_size semantics: the pos-embed grid matches the forced
        # size; load_pretrained bicubic-resizes a pretrained table on mismatch) — the
        # model trains AT that resolution, unlike --wire-size which only changes the
        # host-side decode size and upsamples on device.
        force_image_size=args.force_image_size,
        remat=args.grad_checkpointing or None,
        patch_dropout=args.force_patch_dropout,
        force_quick_gelu=args.force_quick_gelu,
        siglip=args.loss == "siglip",
        lora_rank=args.lora_rank,
        lora_alpha=args.lora_alpha,
        int8_forward=args.precision == "int8",
    )
    params = init_params(model, jax.random.PRNGKey(args.seed))
    if args.pretrained:
        from multimodal_tpu.models.checkpoint_interop import load_pretrained

        params = load_pretrained(args.pretrained, params, model.cfg)
    log.info("model %s: %.1fM params", args.model, param_count(params) / 1e6)

    # ------------------------------------------------------------------- data
    dataset_type = args.dataset_type
    if dataset_type == "auto":
        dataset_type = "synthetic" if not args.train_data else (
            "webdataset" if ".tar" in args.train_data else "coco"
        )
    data_kw = {
        # --wire-size: decode/crop at a smaller host-side resolution; the engine's
        # batch_images upsamples to model resolution ON DEVICE (bicubic, fused into the
        # step prolog). (wire/model)^2 less host->device bandwidth — the lever when the
        # host link, not the decode, bounds real-input throughput.
        "image_size": args.wire_size or model.cfg.vision.image_size,
        "context_length": model.cfg.text.context_length,
    }
    if dataset_type == "webdataset":
        data_kw.update(
            resampled=args.dataset_resampled,
            weights=args.train_data_upsampling_factors,
        )
    if dataset_type == "csv":
        data_kw.update(img_key=args.csv_img_key, caption_key=args.csv_caption_key,
                       sep=args.csv_separator)
    if dataset_type == "synthetic":
        data_kw.update(
            num_samples=args.train_num_samples or 100 * args.batch_size,
            vocab_size=model.cfg.text.vocab_size,
        )
    # AlignCLIP NL semantic supervision: host-side caption embeddings as a batch field
    # (reference run.py:375-376 SBERT load + train.py:92-96 per-batch embed)
    if args.nl_semantic_supervision and args.loss == "align":
        if dataset_type == "synthetic":
            data_kw.update(with_semantic=256)
        else:
            from multimodal_tpu.data.semantic import make_semantic_encoder

            data_kw.update(semantic_encoder=make_semantic_encoder(
                getattr(args, "semantic_model_path", None)
            ))
    if getattr(args, "aug_cfg", None):
        # timm-style augmentation config (reference transform.py:18-27,88-106): crop
        # scale/ratio parameterize the decode-time RandomResizedCrop; color_jitter /
        # grayscale_prob / re_prob run as post-decode numpy stages (data/augment.py).
        # Unsupported keys warn loudly inside parse_aug_cfg.
        if dataset_type == "synthetic":
            log.warning("--aug-cfg has no effect on synthetic data (no decode stage)")
        else:
            from multimodal_tpu.data.augment import parse_aug_cfg

            data_kw.update(aug_cfg=parse_aug_cfg(dict(args.aug_cfg)))
    train_src = build_dataset(
        dataset_type, path=args.train_data or "", batch_size=args.batch_size,
        train=True, seed=args.seed, num_hosts=num_hosts, host_id=host_id,
        num_workers=max(args.workers, 1), **data_kw,
    )
    data_train = DataInfo(train_src, sharding=data_sharding(mesh))
    data_val = None
    if args.val_data:
        val_type = "webdataset" if ".tar" in args.val_data else dataset_type
        val_kw = {"image_size": data_kw["image_size"],
                  "context_length": data_kw["context_length"]}
        if val_type == "synthetic":
            # same backend kwargs as the train split: without vocab_size the fake
            # tokens index past a small model's embed table (NaN-fill gathers), and
            # without num_samples the val set balloons to the 12800-sample default
            val_kw.update(
                num_samples=args.val_num_samples or 10 * args.batch_size,
                vocab_size=model.cfg.text.vocab_size,
            )
        if val_type == "csv":
            val_kw.update(img_key=args.csv_img_key, caption_key=args.csv_caption_key,
                          sep=args.csv_separator)
        val_src = build_dataset(
            val_type, path=args.val_data, batch_size=args.batch_size, train=False,
            seed=args.seed, num_hosts=num_hosts, host_id=host_id, **val_kw,
        )
        data_val = DataInfo(val_src, sharding=data_sharding(mesh))

    steps_per_epoch = (
        args.steps_per_epoch
        or (args.train_num_samples // args.batch_size if args.train_num_samples else None)
        or getattr(train_src, "num_batches", None)
        or 1000
    )
    total_steps = steps_per_epoch * args.epochs

    # -------------------------------------------------------------- optimizer
    if args.skip_scheduler:  # constant LR, no warmup/decay (params.py --skip-scheduler)
        schedule = args.lr
    else:
        schedule = make_schedule(
            args.lr_scheduler, args.lr, warmup_steps=args.warmup, total_steps=total_steps,
            cooldown_steps=(args.epochs_cooldown or 0) * steps_per_epoch,
            cooldown_power=args.lr_cooldown_power, cooldown_end_lr=args.lr_cooldown_end,
        )
    tx = make_optimizer(
        schedule, weight_decay=args.wd, beta1=args.beta1, beta2=args.beta2, eps=args.eps,
        grad_clip_norm=args.grad_clip_norm, skip_nonfinite=args.skip_nonfinite,
        opt=args.opt, state_dtype=jnp.dtype(args.opt_state_dtype),
    )
    if args.lora_rank:
        masked, mask = _finetune_mask(params, "lora")
        tx = freeze_optimizer(tx, mask)
    elif args.train_projections_only or args.freeze_backbone:
        masked, mask = _finetune_mask(
            params, "heads" if args.freeze_backbone else "projections")
        tx = freeze_optimizer(tx, mask)
    elif args.lock_image or args.lock_text:
        masked, mask = _freeze_mask(
            params, args.lock_image, args.lock_text,
            unlocked_image_groups=args.lock_image_unlocked_groups,
            unlocked_text_layers=args.lock_text_unlocked_layers,
            freeze_layer_norm=args.lock_text_freeze_layer_norm,
        )
        tx = freeze_optimizer(tx, mask)

    state = TrainState.create(params, tx, ema=args.model_ema)
    state_shardings = None
    if args.opt_state_offload and (tp > 1 or ep > 1 or args.fsdp):
        # composing the pinned-host moment placement into the TP/FSDP/EP sharding trees
        # is unimplemented; silently skipping it would leave the step device_putting
        # moments host-side while out_shardings place them back in HBM — a wasted
        # HBM<->host round trip every step. Refuse loudly instead.
        raise SystemExit(
            "--opt-state-offload does not compose with --tp/--ep/--fsdp "
            "(the offload memory kinds are not folded into the parallel sharding "
            "trees); drop one of the flags"
        )
    if tp > 1 and args.fsdp:
        # composed 2-D layout: Megatron TP over 'model' + ZeRO over 'data' on the same
        # weights (parallel/compose.py) — the standard layout past single-axis scaling
        from multimodal_tpu.parallel.compose import (
            fsdp_tp_state_shardings, shard_state_fsdp_tp)

        state_shardings = fsdp_tp_state_shardings(state, mesh)
        state = shard_state_fsdp_tp(state, mesh)
    elif tp > 1:
        from multimodal_tpu.parallel.tp import shard_state, tp_state_shardings

        state_shardings = tp_state_shardings(state, mesh)
        state = shard_state(state, mesh)
    elif ep > 1:
        from multimodal_tpu.parallel.ep import ep_state_shardings, shard_state_ep

        state_shardings = ep_state_shardings(state, mesh)
        state = shard_state_ep(state, mesh)
    elif args.fsdp:
        from multimodal_tpu.parallel.fsdp import fsdp_state_shardings, shard_state_fsdp

        state_shardings = fsdp_state_shardings(state, mesh)
        state = shard_state_fsdp(state, mesh)
    elif args.opt_state_offload:
        from multimodal_tpu.parallel.offload import (
            offload_state_shardings, shard_state_offload)

        state_shardings = offload_state_shardings(state, mesh)
        state = shard_state_offload(state, mesh)
    else:
        state = jax.device_put(state, replicated_sharding(mesh))

    # ---------------------------------------------------------------- resume
    ckpt = CheckpointManager(
        os.path.join(args.log_dir, "checkpoints"),
        max_to_keep=1 if args.delete_previous_checkpoint else None,
        async_save=args.async_checkpointing,
    )
    start_epoch = 0
    resume_skip_steps = 0
    if args.resume:
        step = None if args.resume == "latest" else int(args.resume)
        template = jax.device_get(state)
        try:
            restored, meta = ckpt.restore(template, step=step)
        except Exception as e:  # pytree mismatch: --model-ema toggled across the resume
            import dataclasses as _dc

            alt = _dc.replace(
                template,
                ema_params=None if template.ema_params is not None
                else jax.tree_util.tree_map(lambda x: x, template.params),
            )
            try:
                restored, meta = ckpt.restore(alt, step=step)
            except Exception:
                raise e  # surface the original error
            if args.model_ema:  # checkpoint predates EMA: seed it from the params
                restored = _dc.replace(
                    restored,
                    ema_params=jax.tree_util.tree_map(jnp.copy, restored.params))
                log.info("resume: checkpoint had no EMA; initialized it from params")
            else:  # checkpoint carries an EMA this run doesn't use: drop it
                restored = _dc.replace(restored, ema_params=None)
                log.info("resume: dropped the checkpoint's EMA (--model-ema off)")
        if restored is not None:
            state = jax.device_put(
                restored, state_shardings if state_shardings is not None
                else replicated_sharding(mesh))
            meta = meta or {}
            if meta.get("mid_epoch"):
                # preemption-safe resume: re-enter the interrupted epoch and fast-forward
                # past the batches already trained (deterministic set_epoch data order)
                start_epoch = meta.get("epoch", 0)
                resume_skip_steps = meta.get("step_in_epoch", 0)
                log.info("resumed mid-epoch from step %s (epoch %d, %d batches done)",
                         ckpt.latest_step(), start_epoch, resume_skip_steps)
            else:
                start_epoch = meta.get("epoch", 0) + 1
                log.info("resumed from step %s (epoch %d)", ckpt.latest_step(),
                         start_epoch)
        else:
            log.info("no checkpoint found; starting fresh")

    sync_stop = None
    if args.remote_sync and host_id == 0:
        sync_stop = _start_remote_sync(args.log_dir, args.remote_sync,
                                       args.remote_sync_frequency)

    # ----------------------------------------------------------------- loops
    rng = jax.random.PRNGKey(args.seed + 1)

    # eval-only mode (run.py:378-400): --epochs 0 -> evaluate (val/zero-shot/retrieval), exit
    if args.epochs == 0:
        record = {"eval": True}
        eval_params = (state.ema_params
                       if args.model_ema and state.ema_params is not None
                       else state.params)
        if data_val is not None:
            record.update(evaluate(model, eval_params, data_val, mesh, 0, args))
        record.update(zero_shot_eval_all(model, eval_params, args, mesh))
        record.update(retrieval_eval_all(model, eval_params, args))
        record.update(linear_probe_eval(model, eval_params, args))
        record.update(captioning_eval(model, eval_params, args))
        log.info("eval-only: %s", record)
        exp_logger.log(record)
        return 0

    def build_step(epoch: int):
        return build_train_step(args, model, tx, mesh, state_shardings, epoch)

    # the step is compiled once; only KL annealing / the riemannian flip (changed
    # constants) force a rebuild — the ramp ends at 2*kl_warmup_epochs, the tangent
    # projection switches on at kl_warmup_epochs + 1
    rebuild_every_epoch = args.loss == "vclip" and (
        bool(args.kl_warmup_epochs) or args.distribution_type != "normal"
    )
    step_fn = build_step(start_epoch)
    for epoch in range(start_epoch, args.epochs):
        data_train.set_epoch(epoch)
        if (rebuild_every_epoch and epoch != start_epoch
                and epoch <= 2 * args.kl_warmup_epochs + 1):
            step_fn = build_step(epoch)
        t0 = time.perf_counter()
        state, losses, n_steps, rng = train_one_epoch(
            step_fn, state, data_train, epoch, args, exp_logger, num_devices, rng,
            ckpt=ckpt, skip_steps=resume_skip_steps if epoch == start_epoch else 0,
        )
        log.info("epoch %d done: %d steps in %.1fs", epoch, n_steps,
                 time.perf_counter() - t0)
        if _preemption_stop(args):
            # the signal may have landed AFTER the loop's last per-step check, in which
            # case no mid-epoch save ran — don't lose the epoch's steps
            cur = int(jax.device_get(state.step))
            ckpt.wait()
            if n_steps and ckpt.latest_step() != cur:
                done = (resume_skip_steps if epoch == start_epoch else 0) + n_steps
                ckpt.save(cur, jax.device_get(state),
                          metadata={"epoch": epoch, "name": args.name,
                                    "mid_epoch": True, "step_in_epoch": done})
                log.info("preemption: saved step %d before exit", cur)
            break  # exit cleanly for reschedule; resume with --resume latest

        # evaluate the EMA weights when --model-ema is on (the averaged model is the
        # one you'd serve); raw params otherwise
        eval_params = (state.ema_params
                       if args.model_ema and state.ema_params is not None
                       else state.params)
        if data_val is not None and (epoch + 1) % args.val_frequency == 0:
            metrics = evaluate(model, eval_params, data_val, mesh, epoch, args)
            log.info("eval epoch %d: %s", epoch, metrics)
            exp_logger.log(metrics, step=int(jax.device_get(state.step)))

        if not args.variational and (epoch + 1) % args.zeroshot_frequency == 0:
            zs = zero_shot_eval_all(model, eval_params, args, mesh)
            if zs:
                exp_logger.log({"epoch": epoch, **zs}, step=int(jax.device_get(state.step)))
        if not args.variational and (epoch + 1) % args.retrieval_frequency == 0:
            rt = retrieval_eval_all(model, eval_params, args)
            if rt:
                exp_logger.log({"epoch": epoch, **rt}, step=int(jax.device_get(state.step)))

        if (epoch + 1) % args.save_frequency == 0 or epoch == args.epochs - 1:
            cur = int(jax.device_get(state.step))
            ckpt.wait()  # join any in-flight step-frequency save before the step check
            if ckpt.latest_step() == cur:
                # a step-frequency save landed exactly on the epoch boundary; replace it
                # so the surviving metadata is the clean epoch-end one (a stale
                # mid_epoch flag would make resume wastefully replay the whole epoch)
                ckpt.delete(cur)
            ckpt.save(cur, jax.device_get(state),
                      metadata={"epoch": epoch, "name": args.name})
            log.info("saved checkpoint at step %d", cur)

    ckpt.wait()
    ckpt.close()
    if sync_stop is not None:
        sync_stop.set()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
