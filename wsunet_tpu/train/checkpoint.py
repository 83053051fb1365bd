"""Checkpointing with the reference's best/latest + config.json convention.

Parity: src/detector/train.py:280-295 — every epoch writes ``latest``, the
best-validation epoch is copied to ``best``; the experiment's full config
is dumped as config.json beside the checkpoints and re-read at eval time to
reconstruct the model (unet/evaluate.py:151-188).

Storage is Orbax (StandardCheckpointer) over a pytree
``{params, opt_state, epoch, best_val_loss, patience, batch_stats?}``.
"""

import json
import pathlib
import shutil
import typing

import orbax.checkpoint as ocp

# One process-wide checkpointer: constructing a StandardCheckpointer per
# save leaks background machinery and wedged long training runs after
# ~30 epochs of per-epoch saves (observed on the axon TPU runtime).
_CKPTR = None


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_config(experiment_dir: pathlib.Path, config: dict):
    experiment_dir = pathlib.Path(experiment_dir)
    experiment_dir.mkdir(parents=True, exist_ok=True)
    with open(experiment_dir / "config.json", "w") as f:
        json.dump(config, f, indent=4, sort_keys=True, default=str)


def load_config(experiment_dir: pathlib.Path) -> dict:
    with open(pathlib.Path(experiment_dir) / "config.json") as f:
        return json.load(f)


def _replace_dir(src: pathlib.Path, dst: pathlib.Path):
    """Atomically swap ``dst`` for ``src`` (rename, never a window with no
    usable checkpoint on disk: a crash mid-save must not destroy the last
    good ``latest`` — the exact long-run scenario checkpoints exist for)."""
    old = dst.with_name(dst.name + ".old")
    if old.exists():
        shutil.rmtree(old)
    if dst.exists():
        dst.rename(old)
    src.rename(dst)
    if old.exists():
        shutil.rmtree(old)


def save_checkpoint(
    experiment_dir: pathlib.Path,
    state: typing.Any,
    is_best: bool = False,
):
    """Write ``model/latest``; copy to ``model/best`` when ``is_best``.

    Both writes go to a temp sibling first and are renamed into place, so
    an interrupted save leaves the previous checkpoint intact."""
    model_dir = pathlib.Path(experiment_dir) / "model"
    model_dir.mkdir(parents=True, exist_ok=True)
    latest = (model_dir / "latest").resolve()
    tmp = (model_dir / "latest.tmp").resolve()
    ckptr = _checkpointer()
    if tmp.exists():
        shutil.rmtree(tmp)
    ckptr.save(tmp, state)
    ckptr.wait_until_finished()
    _replace_dir(tmp, latest)
    if is_best:
        best = (model_dir / "best").resolve()
        best_tmp = (model_dir / "best.tmp").resolve()
        if best_tmp.exists():
            shutil.rmtree(best_tmp)
        shutil.copytree(latest, best_tmp)
        _replace_dir(best_tmp, best)


def load_checkpoint(
    experiment_dir: pathlib.Path,
    template: typing.Any,
    which: str = "best",
) -> typing.Any:
    """Restore a checkpoint into the structure of ``template``."""
    path = (pathlib.Path(experiment_dir) / "model" / which).resolve()
    if not path.exists():
        raise FileNotFoundError(f"no checkpoint at {path}")
    # Restore the full saved tree, then project onto the template's keys:
    # eval-time templates carry only the subtree they need (e.g. params
    # without opt_state), matching the reference's state_dict-only loads
    # (unet/evaluate.py:185-186).
    full = _checkpointer().restore(path)
    if isinstance(template, dict):
        return {k: full[k] for k in template}
    return full
