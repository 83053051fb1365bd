"""Recalibrate a trained B0's BatchNorm running statistics at the eval
distribution (full 512x512, eval preprocessing), without touching params.

Round-2 finding: detectors trained with BN learn under batch statistics
but their running averages drift (stage-3 validation losses of 7-30 with
good train-mode metrics).  Classic BN recalibration: freeze params, stream
many cover/stego batches through the net in train mode (mutable
batch_stats only), and save the refreshed checkpoint as a sibling run so
the registry can compare both.

Usage: python scripts/bn_recalibrate.py <family_dir> <method> <run_name>
           [num_batches] [batch_size]
e.g.   python scripts/bn_recalibrate.py models_r2/b0 LSBR 2608...dr_0.2 80
"""
import json
import pathlib
import shutil
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def recalibrate(family_dir, method, run_name, num_batches=80, batch_size=4):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from wsunet_tpu.data import iterate_batches, precovers
    from wsunet_tpu.data.simulate import lsbr_simulate, hillr_simulate
    from wsunet_tpu.data.transforms import lsbr_reference as lsbr_reference_tf
    from wsunet_tpu.detect.b0_eval import (
        IMAGENET_GREEN_MEAN, IMAGENET_GREEN_STD, load_pretrained_b0,
        normalize)
    from wsunet_tpu.train.checkpoint import save_checkpoint, load_checkpoint

    src = pathlib.Path(family_dir) / method / run_name
    with open(src / "config.json") as f:
        cfg = json.load(f)
    model, variables, _ = load_pretrained_b0(src.parent, run_name)
    if not jax.tree.leaves(variables.get("batch_stats", {})):
        raise SystemExit("model has no batch_stats (norm != batch)")

    data_path = pathlib.Path(cfg.get("dataset", "/root/reference/data"))
    rates = cfg.get("alpha")
    rates = rates if isinstance(rates, (list, tuple)) else [rates]
    use_ref = cfg.get("lsbr_reference", False)

    def preprocess(x_u8):
        x = x_u8.astype(jnp.float32)[..., None] / 255.0
        if use_ref:
            x = lsbr_reference_tf(x)
        return normalize(x, IMAGENET_GREEN_MEAN, IMAGENET_GREEN_STD)

    @jax.jit
    def stats_step(batch_stats, cover_u8, key):
        ka, ke = jax.random.split(key)
        a = jnp.asarray(rates, jnp.float32)[
            jax.random.randint(ka, (cover_u8.shape[0],), 0, len(rates))]
        if (cfg.get("stego_method", "LSBR")).upper().startswith("LSB"):
            stego = lsbr_simulate(cover_u8, a, ke)
        else:
            # select the per-sample rate for HILLR too (hillr_simulate
            # flips a static count per rate, so compute each candidate and
            # pick per image) — a fixed rates[0] would recalibrate against
            # a narrower embedding distribution than training saw
            r = jnp.asarray(rates, jnp.float32)
            idx = jnp.argmin(jnp.abs(r[:, None] - a[None, :]), axis=0)
            stego = cover_u8
            for i, rate in enumerate(rates):
                stego = jnp.where((idx == i)[:, None, None],
                                  hillr_simulate(cover_u8, float(rate)),
                                  stego)
        x = jnp.concatenate([preprocess(cover_u8), preprocess(stego)])
        _, mutated = model.apply(
            {"params": variables["params"], "batch_stats": batch_stats},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        return mutated["batch_stats"]

    df = precovers(data_path, split=cfg.get("tr_csv", "split_tr.csv"))
    import pandas as pd
    need = num_batches * batch_size
    reps = max(1, -(-need // len(df)))
    df = pd.concat([df] * reps)[:need]

    bs = variables["batch_stats"]
    key = jax.random.PRNGKey(7)
    n = 0
    for batch in iterate_batches(data_path, df, batch_size, cache=True):
        key, ek = jax.random.split(key)
        bs = stats_step(bs, jnp.asarray(batch.pixels), ek)
        n += 1
    print(f"recalibrated over {n} batches of {batch_size} pairs")

    dst = src.parent / (run_name + "-bnrecal")
    if dst.exists():
        shutil.rmtree(dst)
    shutil.copytree(src, dst, ignore=shutil.ignore_patterns("model"))
    state = load_checkpoint(src, None, "best")
    state = dict(state)
    state["batch_stats"] = jax.tree.map(np.asarray, bs)
    save_checkpoint(dst, state, is_best=True)
    # drop 'latest' (save_checkpoint writes it); keep the slim best only
    latest = dst / "model" / "latest"
    if latest.exists():
        shutil.rmtree(latest)
    print("saved:", dst)
    return dst


if __name__ == "__main__":
    family, method, run = sys.argv[1], sys.argv[2], sys.argv[3]
    nb = int(sys.argv[4]) if len(sys.argv) > 4 else 80
    bsz = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    recalibrate(family, method, run, nb, bsz)
