"""Strip trained experiments to inference-only checkpoints for committing.

Keeps the experiment-dir convention (config.json + model/best) but drops
optimizer state and the 'latest' copy, shrinking a U-Net experiment from
~41MB to ~7.5MB so demo checkpoints can live in the repo.
"""

import pathlib
import shutil
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def export(src_root: pathlib.Path, keep_keys=("params", "batch_stats", "epoch")):
    # pin CPU BEFORE the backend initializes: the axon TPU plugin ignores
    # JAX_PLATFORMS, and orbax restore/save would otherwise block on the
    # device lock while a training run holds the chip
    import jax
    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    for cfg in sorted(src_root.glob("*/*/config.json")):
        exp = cfg.parent
        best = (exp / "model" / "best").resolve()
        if not best.exists():
            continue
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(best)
        slim = {k: v for k, v in state.items() if k in keep_keys}
        if set(slim) == set(state):
            print(f"already slim: {exp}")
            continue
        tmp = (exp / "model" / "best_slim").resolve()
        if tmp.exists():
            shutil.rmtree(tmp)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(tmp, slim)
        shutil.rmtree(best)
        tmp.rename(best)
        latest = exp / "model" / "latest"
        if latest.exists():
            shutil.rmtree(latest)
        print(f"slimmed: {exp}")


if __name__ == "__main__":
    export(REPO / "models" / "unet")
    export(REPO / "models" / "b0")
