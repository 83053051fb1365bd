"""EfficientNet-B0 detector training.

Parity: reference src/detector/train.py:25-304 — CE loss + AdamW,
per-epoch reshuffle, Loss/Accuracy/P_E/PMD@5FP meters, TensorBoard
scalars, best/latest checkpoints, patience early-stopping, optional resume
from a previous experiment's best checkpoint (the golden configs show the
alpha=.01 model warm-started from the alpha=.05 one).

TPU-native differences: cover/stego pairs are built ON DEVICE (each cover
batch is duplicated into a cover half and a freshly-simulated stego half),
the step is jitted with BN batch_stats mutable, and batches shard over the
1-D data mesh.
"""

import pathlib
import time

import numpy as np
import pandas as pd
import optax
import jax
import jax.numpy as jnp

from ..data import iterate_batches, precovers
from ..data.simulate import hillr_simulate, lsbr_simulate
from ..data.transforms import lsbr_reference as lsbr_reference_tf, normalize
from ..detect.b0_eval import IMAGENET_GREEN_MEAN, IMAGENET_GREEN_STD
from ..detect.metrics import (
    AccuracyMeter, LossMeter, PEMeter, PMD5FPMeter, ProgressMeter)
from ..models import get_b0
from ..parallel import get_mesh, replicate, shard_batch
from ..utils import create_run_name, setup_logger
from .checkpoint import load_checkpoint, save_checkpoint, save_config
from .train_unet import MetricWriter

from .config import B0TrainConfig

log = setup_logger("train_b0")

import dataclasses as _dataclasses
_DATACLASS_DEFAULTS = _dataclasses.asdict(B0TrainConfig())
DEFAULT_CONFIG = _DATACLASS_DEFAULTS


def _make_steps(model, optimizer, cfg):
    stego_method = cfg["stego_method"]
    alpha = cfg["alpha"]
    use_ref = cfg["lsbr_reference"]
    crop = cfg.get("crop")
    augment = cfg.get("augment", False)

    def random_crop(x_u8, key):
        if crop is None or crop >= x_u8.shape[1]:
            return x_u8
        B, H, W = x_u8.shape
        ki, kj = jax.random.split(key)
        oi = jax.random.randint(ki, (B,), 0, H - crop + 1)
        oj = jax.random.randint(kj, (B,), 0, W - crop + 1)
        return jax.vmap(
            lambda img, i, j: jax.lax.dynamic_slice(img, (i, j), (crop, crop))
        )(x_u8, oi, oj)

    def augment_batch(x_u8, key):
        if not augment:
            return x_u8
        from ..data.transforms import random_flip, random_rot90
        kf, kr = jax.random.split(key)
        x = x_u8[..., None]
        return random_rot90(random_flip(x, kf), kr)[..., 0]

    val_alpha = cfg.get("val_alpha") or alpha

    def draw_alphas(B, key, rates):
        """Per-image embedding rate; a list config trains one detector over
        a rate mixture (the curriculum substitute for the reference's
        resume-from-higher-alpha warm start, config.json "resume")."""
        if isinstance(rates, (list, tuple)):
            r = jnp.asarray(rates, jnp.float32)
            return r[jax.random.randint(key, (B,), 0, len(r))]
        return jnp.full((B,), float(rates), jnp.float32)

    def embed(cover_u8, alphas, key, rates):
        if stego_method.upper().startswith("LSB"):
            return lsbr_simulate(cover_u8, alphas, key)
        if isinstance(rates, (list, tuple)):
            # hillr flips a static count per rate: compute each candidate
            # (len(rates) static top_k passes) and select per image
            r = jnp.asarray(rates, jnp.float32)
            idx = jnp.argmin(jnp.abs(r[:, None] - alphas[None, :]), axis=0)
            out = cover_u8
            for i, a in enumerate(rates):
                out = jnp.where((idx == i)[:, None, None],
                                hillr_simulate(cover_u8, float(a)), out)
            return out
        return hillr_simulate(cover_u8, float(rates))

    def preprocess(x_u8):
        x = x_u8.astype(jnp.float32)[..., None] / 255.0
        if use_ref:
            x = lsbr_reference_tf(x)
        return normalize(x, IMAGENET_GREEN_MEAN, IMAGENET_GREEN_STD)

    def make_pair(cover_u8, mask, key, rates):
        k_crop, k_aug, k_alpha, key = jax.random.split(key, 4)
        cover_u8 = random_crop(cover_u8, k_crop)
        cover_u8 = augment_batch(cover_u8, k_aug)
        alphas = draw_alphas(cover_u8.shape[0], k_alpha, rates)
        stego_u8 = embed(cover_u8, alphas, key, rates)
        x = jnp.concatenate([preprocess(cover_u8), preprocess(stego_u8)])
        y = jnp.concatenate([
            jnp.zeros(cover_u8.shape[0], jnp.int32),
            jnp.ones(cover_u8.shape[0], jnp.int32)])
        w = jnp.concatenate([mask, mask]).astype(jnp.float32)
        return x, y, w

    # freeze_bn: train against the FROZEN running statistics (the ones
    # eval will use).  Batch statistics over in-batch cover/stego pairs
    # normalize contrastively — a shortcut that evaporates at eval time
    # (observed: plain detector train p_e 0.31, eval at chance).  With
    # frozen stats the train-mode objective IS the eval-mode computation,
    # so only per-image features can reduce the loss.  Start from a
    # recalibrated checkpoint (scripts/bn_recalibrate.py).  Head dropout
    # is off in this mode (train=False apply).
    freeze_bn = cfg.get("freeze_bn", False)

    def loss_fn(params, batch_stats, x, y, w, dropout_key, train):
        variables = {"params": params, "batch_stats": batch_stats}
        if train and not freeze_bn:
            logits, mutated = model.apply(
                variables, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_key})
            # norm="group" has no batch_stats collection to mutate
            new_stats = mutated.get("batch_stats", batch_stats)
        else:
            logits = model.apply(variables, x, train=False)
            new_stats = batch_stats
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        # masked mean: padded tail rows must not steer gradients or the
        # early-stopping validation loss
        loss = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, (logits, new_stats)

    @jax.jit
    def train_step(params, batch_stats, opt_state, cover_u8, mask, key,
                   dropout_key):
        x, y, w = make_pair(cover_u8, mask, key, alpha)
        (loss, (logits, batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            params, batch_stats, x, y, w, dropout_key, True)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, batch_stats, opt_state, loss, logits, y

    @jax.jit
    def eval_step(params, batch_stats, cover_u8, mask, key):
        x, y, w = make_pair(cover_u8, mask, key, val_alpha)
        loss, (logits, _) = loss_fn(
            params, batch_stats, x, y, w, jax.random.PRNGKey(0), False)
        return loss, logits, y

    return train_step, eval_step


def train(config: dict, data_path: pathlib.Path, output_dir: pathlib.Path):
    cfg = B0TrainConfig.validate(config)
    run_name = time.strftime("%y%m%d%H%M%S") + "-tpu-" + create_run_name(cfg)
    exp_dir = pathlib.Path(output_dir) / cfg["stego_method"] / run_name
    save_config(exp_dir, {**cfg, "dataset": str(data_path)})
    writer = MetricWriter(exp_dir / "log")

    in_channels = 1 if cfg["grayscale"] else 3
    in_channels += 3 if cfg["demosaic_oracle"] else 0
    in_channels += 1 if cfg["lsbr_reference"] else 0
    model = get_b0(
        in_channels=in_channels,
        no_stem_stride=cfg["no_stem_stride"],
        drop_rate=cfg["drop_rate"],
        stem_init=cfg.get("stem_init", "default"),
        quadratic_stem=cfg.get("quadratic_stem", False),
        parity_features=cfg.get("parity_features", False),
        norm=cfg.get("norm", "batch"),
        compute_dtype=jnp.dtype(cfg["compute_dtype"]))

    df_tr = precovers(data_path, split=cfg["tr_csv"])
    df_va = precovers(data_path, split=cfg["va_csv"])
    steps_per_epoch = cfg.get("steps_per_epoch") or max(
        1, len(df_tr) // cfg["batch_size"])
    from .train_unet import make_optimizer
    optimizer = make_optimizer(cfg, steps_per_epoch)

    key = jax.random.PRNGKey(cfg["seed"] or 0)
    key, init_key, drop_key = jax.random.split(key, 3)
    shape = tuple(cfg["shape"])
    variables = jax.jit(model.init)(
        {"params": init_key, "dropout": drop_key},
        jnp.zeros((1, *shape, in_channels), jnp.float32))
    # norm="group" models carry no batch_stats collection; keep an empty
    # pytree so the checkpoint/replication plumbing is shape-stable
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if cfg["resume"]:
        resume_dir = pathlib.Path(output_dir) / cfg["stego_method"] / cfg["resume"]
        state = load_checkpoint(
            resume_dir, {"params": params, "batch_stats": batch_stats}, "best")
        params, batch_stats = state["params"], state["batch_stats"]
        log.info(f"resumed from {resume_dir}")

    opt_state = optimizer.init(params)
    mesh = get_mesh()
    params = replicate(mesh, params)
    batch_stats = replicate(mesh, batch_stats)
    opt_state = replicate(mesh, opt_state)

    train_step, eval_step = _make_steps(model, optimizer, cfg)

    rng = np.random.default_rng(cfg["seed"])

    best_val_loss = np.inf
    patience = cfg["patience"]
    for epoch in range(cfg["num_epochs"]):
        df_ep = df_tr.sample(frac=1.0, random_state=rng.integers(2 ** 31)) \
            if len(df_tr) > 1 else df_tr
        if cfg.get("steps_per_epoch"):
            need = cfg["steps_per_epoch"] * cfg["batch_size"]
            reps = max(1, -(-need // len(df_ep)))
            df_ep = pd.concat([df_ep] * reps)[:need]
        loss_meter = LossMeter(":.4e")
        acc = AccuracyMeter()
        pe, pmd = PEMeter(), PMD5FPMeter()
        progress = ProgressMeter(
            max(1, len(df_ep) // cfg["batch_size"]),
            [loss_meter, pe, pmd, acc], prefix=f"Epoch: [{epoch}]")
        for batch in iterate_batches(data_path, df_ep, cfg["batch_size"], cache=True):
            key, ek, dk = jax.random.split(key, 3)
            pixels, mask = shard_batch(
                mesh, (jnp.asarray(batch.pixels), jnp.asarray(batch.mask)))
            params, batch_stats, opt_state, loss, logits, y = train_step(
                params, batch_stats, opt_state, pixels, mask, ek, dk)
            outputs = jax.nn.softmax(logits, axis=1)[:, 1]
            m = np.concatenate([batch.mask, batch.mask])
            loss_meter.update(float(loss), int(m.sum()))
            y_np = np.asarray(y)[m]
            acc.update(y_np, np.asarray(jnp.argmax(logits, axis=1))[m])
            pe.update(y_np, np.asarray(outputs)[m])
            pmd.update(y_np, np.asarray(outputs)[m])
        log.info(progress.to_str(0))
        for m in [loss_meter, pe, pmd, acc]:
            writer.add_scalar(f"train/{m.name}", m.avg, epoch)

        va_loss = LossMeter()
        va_pe, va_pmd, va_acc = PEMeter(), PMD5FPMeter(), AccuracyMeter()
        # val_steps repeats the (possibly single-cover) val catalog so the
        # selection P_E is computed over many deterministic crop/embedding
        # draws instead of a handful of images
        df_va_ep = df_va
        if cfg.get("val_steps"):
            need = cfg["val_steps"] * cfg["batch_size"]
            reps = max(1, -(-need // len(df_va)))
            df_va_ep = pd.concat([df_va] * reps)[:need]
        # deterministic per-batch val keys (see train_unet note)
        for vb, batch in enumerate(iterate_batches(
                data_path, df_va_ep, cfg["batch_size"], cache=True)):
            ek = jax.random.fold_in(jax.random.PRNGKey(cfg["seed"] or 0), vb)
            pixels, mask = shard_batch(
                mesh, (jnp.asarray(batch.pixels), jnp.asarray(batch.mask)))
            loss, logits, y = eval_step(params, batch_stats, pixels, mask, ek)
            outputs = jax.nn.softmax(logits, axis=1)[:, 1]
            m = np.concatenate([batch.mask, batch.mask])
            va_loss.update(float(loss), int(m.sum()))
            y_np = np.asarray(y)[m]
            va_acc.update(y_np, np.asarray(jnp.argmax(logits, axis=1))[m])
            va_pe.update(y_np, np.asarray(outputs)[m])
            va_pmd.update(y_np, np.asarray(outputs)[m])
        for m in [va_loss, va_pe, va_pmd, va_acc]:
            writer.add_scalar(f"val/{m.name}", m.avg, epoch)
        log.info(f"epoch {epoch}: val loss {va_loss.avg:.5f} "
                 f"p_e {va_pe.avg:.3f} acc {va_acc.avg:.3f}")

        val_loss = (va_pe.avg if cfg.get("select_metric") == "p_e"
                    else va_loss.avg)
        state = {"params": params, "batch_stats": batch_stats,
                 "opt_state": opt_state, "epoch": epoch,
                 "best_val_loss": float(best_val_loss), "patience": patience}
        # "last": best tracks the end of the schedule (see train_unet.py —
        # noisy small-val-set meters make min-selection a lottery)
        is_best = (True if cfg.get("select_metric") == "last"
                   else val_loss < best_val_loss)
        save_checkpoint(exp_dir, state, is_best=is_best)
        if is_best:
            patience = cfg["patience"]
            best_val_loss = val_loss
        else:
            patience -= 1
        if patience <= 0:
            log.info("early stopping (patience exhausted)")
            break

    writer.close()
    return exp_dir
