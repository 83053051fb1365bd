"""Command-line interface.

Mirrors the reference's README command surface (README.md:5-27: one python
script per analysis) as subcommands of a single typed CLI:

    python -m wsunet_tpu filters-eval   ~ python filters/evaluate.py
    python -m wsunet_tpu ws-eval        ~ python ws/estimate.py
    python -m wsunet_tpu unet-eval      ~ python unet/evaluate.py
    python -m wsunet_tpu detector-eval  ~ python detector/evaluate.py
    python -m wsunet_tpu roc            ~ python ws/roc.py
    python -m wsunet_tpu train-unet     ~ (private-repo unet trainer)
    python -m wsunet_tpu train-b0       ~ python detector/train.py
    python -m wsunet_tpu correlation    ~ python correlation.py
    python -m wsunet_tpu error-boxes    ~ python error_boxes.py
    python -m wsunet_tpu contour        ~ python contour.py
    python -m wsunet_tpu saliency       ~ python saliency.py
    python -m wsunet_tpu init-dataset   (new: catalog any cover folder)
    python -m wsunet_tpu simulate       (new: generate stego fixtures)
    python -m wsunet_tpu bench          (new: throughput benchmark)
    python -m wsunet_tpu serve          (new: batch-1 serving loop)
"""

import argparse
import json
import pathlib
import sys


def _common(p):
    p.add_argument("--data", type=pathlib.Path, default=pathlib.Path("data"),
                   help="dataset root (with files.csv subdirs)")
    p.add_argument("--results", type=pathlib.Path,
                   default=pathlib.Path("results"), help="output root")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--split", default=None,
                   help="restrict to a split CSV (e.g. split_te.csv)")
    p.add_argument("--take", type=int, default=None,
                   help="take only the first N images")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="wsunet_tpu",
        description="TPU-native WS steganalysis framework")
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("filters-eval", help="KB/AVG prediction error (MAE/wMAE)")
    _common(p)
    p.add_argument("--filters", nargs="+", default=["AVG", "KB"])
    p.add_argument("--channels", nargs="+", type=int, default=None,
                   help="[R,G,B,Y] plane per filter (default: Y for each)")
    p.add_argument("--inbayer", default=None, choices=["00", "01", "10", "11"],
                   help="Bayer-phase subsample of the residual grid")

    p = sub.add_parser("ws-eval", help="WS attack sweep")
    _common(p)
    p.add_argument("--models", nargs="+", default=["AVG", "KB"],
                   help="filter names and/or UNet")
    p.add_argument("--model-dir", type=pathlib.Path,
                   default=pathlib.Path("models/unet"))
    p.add_argument("--train-method", default="LSBR",
                   help="stego method the UNet was trained on")
    p.add_argument("--stego-methods", nargs="+", default=["LSBR"],
                   help="stego methods to attack (covers always included)")
    p.add_argument("--alphas", nargs="+", type=float, default=[.4, .2, .1])
    p.add_argument("--weighted", type=int, default=0, choices=[-1, 0, 1])
    p.add_argument("--correct-bias", action="store_true")
    p.add_argument("--channels", nargs="+", type=int, default=[3],
                   help="[R,G,B,Y] planes: attacked channel last; two or "
                        "three channels select the color4/color8 OLS layout")

    p = sub.add_parser("unet-eval", help="U-Net inference + WS prediction error")
    _common(p)
    p.add_argument("--model-dir", type=pathlib.Path,
                   default=pathlib.Path("models/unet"))
    p.add_argument("--stego-method", default="LSBR",
                   help="training method of the model (dropout/LSBR/HILLR)")

    p = sub.add_parser("detector-eval", help="B0 detector scores")
    _common(p)
    p.add_argument("--model-dir", type=pathlib.Path,
                   default=pathlib.Path("models/b0"))
    p.add_argument("--stego-method", default="LSBR")
    p.add_argument("--no-stem-stride", action="store_true")
    p.add_argument("--lsbr-reference", action="store_true")

    p = sub.add_parser("roc", help="ROC/AUC/P_E over WS + B0 detectors")
    _common(p)
    p.add_argument("--unet-model-dir", type=pathlib.Path,
                   default=pathlib.Path("models/unet"))
    p.add_argument("--b0-model-dir", type=pathlib.Path,
                   default=pathlib.Path("models/b0"))
    p.add_argument("--train-method", default="LSBR")
    p.add_argument("--stego-methods", nargs="+", default=["LSBR"],
                   help="stego methods to build curves for (e.g. HILLR)")
    p.add_argument("--alphas", nargs="+", type=float, default=[.1, .05, .01])
    p.add_argument("--models", nargs="+",
                   default=["AVG", "KB", "KB-w", "KB-sca", "UNet"])
    p.add_argument("--b0", action="store_true", help="include B0 detectors")
    p.add_argument("--b0-train-alpha", type=float, default=None,
                   help="registry filter on the B0 training alpha (labels "
                        "always come from the model's own config)")

    p = sub.add_parser("train-unet", help="train the U-Net predictor")
    _common(p)
    p.add_argument("--output-dir", type=pathlib.Path,
                   default=pathlib.Path("models/unet"))
    p.add_argument("--config", type=json.loads, default={},
                   help='JSON config overrides, e.g. \'{"alpha":0.4}\'')

    p = sub.add_parser("train-b0", help="train the B0 detector")
    _common(p)
    p.add_argument("--output-dir", type=pathlib.Path,
                   default=pathlib.Path("models/b0"))
    p.add_argument("--config", type=json.loads, default={})

    p = sub.add_parser("correlation", help="residual/change correlation")
    _common(p)
    p.add_argument("--model-dir", type=pathlib.Path, default=None)

    p = sub.add_parser("error-boxes", help="AE boxplots bucketed by KB error")
    _common(p)
    p.add_argument("--model-dir", type=pathlib.Path, default=None)
    p.set_defaults(split="split_te.csv")

    p = sub.add_parser("contour", help="difference-image contours")
    _common(p)
    p.add_argument("--image", default="images/6.png")
    p.add_argument("--model-dir", type=pathlib.Path, default=None)

    p = sub.add_parser("saliency", help="U-Net gradient saliency grid")
    _common(p)
    p.add_argument("--image", default="images/6.png")
    p.add_argument("--model-dir", type=pathlib.Path,
                   default=pathlib.Path("models/unet"))
    p.add_argument("--stego-method", default="LSBR")
    p.add_argument("--points", type=json.loads,
                   default=[[307, 10], [261, 64], [155, 381], [9, 25]])

    p = sub.add_parser("init-dataset",
                       help="build files.csv + split CSVs for a cover folder")
    _common(p)
    p.add_argument("--images-dir", default="images")
    p.add_argument("--fractions", nargs=3, type=float, default=[.6, .2, .2])

    p = sub.add_parser("simulate", help="generate stego fixture directories")
    _common(p)
    p.add_argument("--method", choices=["LSBr", "HILLr"], default="LSBr")
    p.add_argument("--alphas", nargs="+", type=float,
                   default=[.01, .05, .1, .2, .4, 1.0])

    p = sub.add_parser("bench", help="UNet+WS throughput benchmark")
    _common(p)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=20)

    p = sub.add_parser(
        "serve", help="single-image WS estimation loop (batch-1 path)")
    p.add_argument("images", nargs="*", type=pathlib.Path,
                   help="image paths; with none given, one path per "
                        "stdin line (an interactive/pipe server loop)")
    p.add_argument("--model-dir", type=pathlib.Path,
                   default=pathlib.Path("models/unet"))
    p.add_argument("--train-method", default="LSBR")
    p.add_argument("--size", type=int, default=512,
                   help="served image height/width (one compiled shape)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--measure-latency", action="store_true",
                   help="print the latency report (median, transport "
                        "floor, net) and exit")

    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    import os
    from .utils import UserError
    from .utils.profiling import nan_check, profile
    with profile(os.environ.get("WSUNET_PROFILE")), \
            nan_check(os.environ.get("WSUNET_DEBUG_NANS") == "1"):
        try:
            try:
                return _dispatch(args)
            finally:
                # release the HBM held by device-cached eval batches as
                # soon as the sweep is over (ADVICE r4) — the host
                # decode cache stays, it costs RAM not HBM
                if args.command in ("roc", "ws-eval", "unet-eval",
                                    "detector-eval", "filters-eval"):
                    from .data.pipeline import clear_device_cache
                    clear_device_cache()
        except (UserError, FileNotFoundError) as e:
            # registry misses / missing data dirs are user errors, not
            # bugs; JAX/XLA RuntimeErrors (device/compile failures) keep
            # their tracebacks.  WSUNET_DEBUG=1 re-raises everything.
            if os.environ.get("WSUNET_DEBUG") == "1":
                raise
            raise SystemExit(f"{args.command}: {e}")


def _dispatch(args):
    cmd = args.command

    # --split/--take select dataset rows; commands that do not walk the
    # catalog reject them instead of silently ignoring the selection
    if (getattr(args, "split", None) or getattr(args, "take", None)) and \
            cmd in ("contour", "saliency", "simulate", "bench",
                    "train-unet", "train-b0", "init-dataset"):
        raise SystemExit(f"{cmd} does not support --split/--take")

    if cmd == "filters-eval":
        from .ws import filters_run
        channels = ([(c,) for c in args.channels] if args.channels
                    else [(3,)] * len(args.filters))
        res = filters_run(args.data, filter_names=args.filters,
                          channels=channels, inbayer=args.inbayer,
                          batch_size=args.batch_size, split=args.split,
                          take_num_images=args.take)
        out = args.results / "prediction" / "filters.csv"
        out.parent.mkdir(parents=True, exist_ok=True)
        res.to_csv(out, index=False)
        print(f"output saved to {out}")

    elif cmd == "ws-eval":
        res = _ws_sweep(args)
        # NOTE the sweep gets its own file: the reference's ws/estimate.py
        # writes ws_<method>.csv too (estimate.py:216,280), silently
        # clobbering unet/evaluate.py's golden-schema file of the same name
        # whenever both are run; the checked-in golden has the unet-eval
        # schema, so the sweep is renamed rather than the parity artifact.
        out = args.results / "estimation" / f"ws_sweep_{args.train_method}.csv"
        out.parent.mkdir(parents=True, exist_ok=True)
        res.to_csv(out, index=False)
        print(f"output saved to {out}")

    elif cmd == "unet-eval":
        from .ws import unet_run
        res = unet_run(args.data, args.model_dir, args.stego_method,
                       batch_size=args.batch_size, split=args.split,
                       take_num_images=args.take)
        out = args.results / "estimation" / f"ws_{args.stego_method}.csv"
        out.parent.mkdir(parents=True, exist_ok=True)
        res.to_csv(out, index=False)
        print(f"output saved to {out}")

    elif cmd == "detector-eval":
        from .detect import b0_run
        res = b0_run(args.data, args.model_dir, args.stego_method,
                     no_stem_stride=args.no_stem_stride,
                     lsbr_reference=args.lsbr_reference,
                     batch_size=args.batch_size, split=args.split,
                     take_num_images=args.take)
        out = args.results / "detection" / "b0.csv"
        out.parent.mkdir(parents=True, exist_ok=True)
        res.to_csv(out, index=False)
        print(f"output saved to {out}")

    elif cmd == "roc":
        _cmd_roc(args)

    elif cmd == "train-unet":
        from .train.train_unet import train
        exp = train(args.config, data_path=args.data,
                    output_dir=args.output_dir)
        print(f"experiment saved to {exp}")

    elif cmd == "train-b0":
        from .train.train_b0 import train
        exp = train(args.config, data_path=args.data,
                    output_dir=args.output_dir)
        print(f"experiment saved to {exp}")

    elif cmd == "correlation":
        from .analyses import run_correlation
        unet = ("dropout", "LSBR", "HILLR") if args.model_dir else ()
        res, agg = run_correlation(args.data, model_dir=args.model_dir,
                                   unet_methods=unet, split=args.split,
                                   take_num_images=args.take)
        out = args.results / "estimation" / "correlation.csv"
        out.parent.mkdir(parents=True, exist_ok=True)
        agg.to_csv(out)
        print(f"output saved to {out}")

    elif cmd == "error-boxes":
        from .analyses import run_error_boxes
        unet = (("dropout", "UNet_l1"), ("LSBR", "UNet_l1ws")) \
            if args.model_dir else ()
        out = args.results / "prediction" / "ae_boxes_3.csv"
        run_error_boxes(args.data, model_dir=args.model_dir,
                        split=args.split, unet_models=unet, outfile=out)
        print(f"output saved to {out}")

    elif cmd == "contour":
        from .analyses import difference_image, plot_contour
        fname = args.data / args.image
        outdir = args.results / "prediction"
        models = ["KB"] + (["unet"] if args.model_dir else [])
        for model in models:
            d = difference_image(
                fname, model_name="KB" if model == "KB" else "UNet",
                model_dir=args.model_dir)
            print("saved", plot_contour(fname, d, model, outdir))

    elif cmd == "saliency":
        from .analyses.saliency import plot_saliency_grid, render_dots
        out = (args.results / "prediction" /
               f"saliency_{args.stego_method}.png")
        plot_saliency_grid(args.data / args.image, args.model_dir,
                           args.stego_method,
                           [tuple(p) for p in args.points], out)
        print(f"output saved to {out}")
        dots = render_dots(args.data / args.image,
                           args.results / "prediction" /
                           "saliency_image_dots.png")
        print(f"output saved to {dots}")

    elif cmd == "init-dataset":
        from .data.init_dataset import init_dataset
        df = init_dataset(args.data, images_dir=args.images_dir,
                          split_fractions=tuple(args.fractions))
        print(f"catalogued {len(df)} covers under {args.data}")

    elif cmd == "simulate":
        _cmd_simulate(args)

    elif cmd == "bench":
        from .bench import run_bench
        print(json.dumps(run_bench(dtype=args.dtype, iters=args.iters,
                                   batch_size=args.batch_size)))

    elif cmd == "serve":
        return _cmd_serve(args)

    return 0


def _cmd_serve(args):
    """One-image-at-a-time WS estimation over the dedicated batch-1
    serving path (serve.UNetWSServer): one JSON line per image on
    stdout ({"name", "beta_hat", "l1"}); per-image failures are
    reported inline ({"name", "error"}) without stopping the loop, so
    the process can sit behind a pipe indefinitely.  The reference has
    no serving story at all — its evaluate scripts are batch sweeps."""
    import sys as _sys

    # guard the jax init like bench/__graft_entry__: with the axon relay
    # down, jax.devices() blocks forever instead of failing
    from .bench import _tpu_reachable
    import jax
    if not _tpu_reachable():
        print("serve: TPU relay unreachable; serving on CPU",
              file=_sys.stderr)
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized (e.g. under pytest)
    import jax.numpy as jnp

    from .io.imread import imread_gray_u8
    from .serve import UNetWSServer, measure_latency
    from .utils.registry import get_model_name
    from .ws.unet_eval import load_pretrained_unet

    name = get_model_name(args.model_dir, args.train_method)
    model, variables, _ = load_pretrained_unet(
        args.model_dir / args.train_method, name,
        compute_dtype=jnp.dtype(args.dtype))
    print(f"serve: {args.train_method}/{name} at "
          f"{args.size}x{args.size} ({args.dtype})", file=_sys.stderr)
    server = UNetWSServer(model, variables, size=args.size,
                          compute_dtype=jnp.dtype(args.dtype))
    if args.measure_latency:
        print(json.dumps(measure_latency(server)))
        return 0

    if args.images:
        # batch of known paths: the pipelined streaming loop overlaps
        # decode + host->device transfer with device compute (serve.
        # stream_paths; VERDICT r4 item 9); per-image failures still
        # surface as inline error lines
        from .serve import stream_paths
        for out in stream_paths(server, [str(p) for p in args.images]):
            print(json.dumps(out), flush=True)
        return 0
    # interactive/pipe loop stays serial: each stdin line is answered
    # before the next is read (a pipelined pipe would hold responses
    # back ``depth`` lines)
    for path in (line.strip() for line in _sys.stdin):
        if not path:
            continue
        try:
            img = imread_gray_u8(path)
            if img.shape != (args.size, args.size):
                raise ValueError(
                    f"expected {args.size}x{args.size}, got "
                    f"{img.shape[0]}x{img.shape[1]} (one compiled "
                    "serving shape; restart with --size to change)")
            beta, l1 = server.predict(img)
            out = {"name": path, "beta_hat": beta, "l1": l1}
        except Exception as e:  # noqa: BLE001 — the loop's contract is
            # "never aborts": a mid-stream transport error (XlaRuntime-
            # Error when the relay drops) must surface as an inline
            # error line, not kill the queued images behind the pipe
            out = {"name": path,
                   "error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(json.dumps(out), flush=True)
    return 0


def _ws_sweep(args, weighted=None, correct_bias=None):
    """The reference's four-predictor WS sweep (ws/estimate.py:208-281):
    named filters plus BOTH trained U-Nets — UNet_l1 (dropout-trained) and
    UNet_l1ws_<method> — in one run.  'UNet' in --models expands to both
    variants; 'UNet_l1' / 'UNet_l1ws' select one."""
    import pandas as pd
    from .ws import ws_run
    from .utils.registry import get_model_name

    unet_variants = {
        "UNET": [("l1", "dropout"), ("l1ws", args.train_method)],
        "UNET_L1": [("l1", "dropout")],
        "UNET_L1WS": [("l1ws", args.train_method)],
    }
    frames = []
    for stego_method in [None] + list(args.stego_methods):
        for alpha in (args.alphas if stego_method else [None]):
            for model in args.models:
                variants = unet_variants.get(model.upper())
                if variants is None:
                    jobs = [(model, None, None)]
                else:
                    jobs = []
                    for loss, tm in variants:
                        try:
                            name = get_model_name(
                                args.model_dir, tm, loss=loss)
                        except RuntimeError as e:
                            print(f"skipping UNet {loss}/{tm}: {e}",
                                  file=sys.stderr)
                            continue
                        label = ("UNet_" + loss +
                                 (f"_{tm}" if loss == "l1ws" else ""))
                        jobs.append((name, args.model_dir / tm, label))
                for model_name, model_path, label in jobs:
                    frames.append(ws_run(
                        input_dir=args.data, stego_method=stego_method,
                        alpha=alpha, model_name=model_name,
                        model_path=model_path,
                        channels=tuple(getattr(args, "channels", None)
                                       or (3,)),
                        weighted=args.weighted if weighted is None
                        else weighted,
                        correct_bias=args.correct_bias if correct_bias is None
                        else correct_bias,
                        batch_size=args.batch_size,
                        split=args.split, take_num_images=args.take,
                        model_label=label))
    res = pd.concat(frames).reset_index(drop=True)
    if "stego_method" in res:
        res["stego_method"] = res["stego_method"].fillna("Cover")
    else:
        res["stego_method"] = "Cover"
    return res


def b0_label(config: dict) -> str:
    """Detector label derived from the model's OWN training config
    (parity: the reference's names encode real training conditions,
    detector/evaluate.py:100-166 — e.g. golden ``ns-r-B0_0.01`` was
    genuinely trained at alpha 0.01; a mixture-trained model here is
    labeled ``B0_mix0.1-0.05-0.01``, never a flag value)."""
    prefix = ("ns-" if config.get("no_stem_stride") else "") + \
        ("r-" if config.get("lsbr_reference") else "")
    alpha = config.get("alpha")
    if isinstance(alpha, (list, tuple)):
        alpha = "mix" + "-".join(str(a) for a in alpha)
    method = config.get("stego_method", "LSBR")
    infix = "" if method == "LSBR" else f"-{method}"
    return f"{prefix}B0{infix}_{alpha}"


def _cmd_roc(args):
    import pandas as pd
    from .detect import b0_run, produce_roc
    from .train.checkpoint import load_config
    from .utils import UserError
    from .utils.registry import get_model_name
    from .ws import ws_run

    # Resolve the trained U-Nets up front.  "UNet" (golden label) is the
    # --train-method model, used on every eval method like the reference
    # sweep (ws/roc.py:367-380, one LSBR-trained UNet).  When
    # --stego-methods names another method with its own trained model, it
    # joins as "UNet_<method>" — each variant needs its own cover pass
    # because produce_roc pairs cover and stego rows by model_name.
    unet_variants = {}
    if any(m.upper() == "UNET" for m in args.models):
        methods = [args.train_method] + [
            sm for sm in args.stego_methods if sm != args.train_method]
        for tm in methods:
            label = "UNet" if tm == args.train_method else f"UNet_{tm}"
            try:
                unet_variants[label] = get_model_name(
                    args.unet_model_dir, tm), args.unet_model_dir / tm
            except UserError as e:
                # notify on EVERY miss (ADVICE r3): a silent registry
                # miss for e.g. the HILLR-trained UNet would just drop
                # its rows from the committed auc/roc artifacts
                print(f"skipping {label}: {e}", file=sys.stderr)

    frames = []
    for stego_method in [None] + list(args.stego_methods):
        for alpha in (args.alphas if stego_method else [None]):
            for model in args.models:
                if model.upper() == "UNET":
                    for label, (name, path) in unet_variants.items():
                        frames.append(ws_run(
                            input_dir=args.data, stego_method=stego_method,
                            alpha=alpha, model_name=name, model_path=path,
                            model_label=label, weighted=0,
                            batch_size=args.batch_size,
                            split=args.split, take_num_images=args.take))
                else:
                    frames.append(ws_run(
                        input_dir=args.data, stego_method=stego_method,
                        alpha=alpha, model_name=model,
                        model_path=None, weighted=0,
                        batch_size=args.batch_size,
                        split=args.split, take_num_images=args.take))
    if args.b0:
        for no_stride, lsbr_ref in [(False, False), (True, True)]:
            filters = dict(no_stem_stride=no_stride,
                           lsbr_reference=lsbr_ref)
            if args.b0_train_alpha is not None:
                filters["alpha"] = args.b0_train_alpha
            try:
                name = get_model_name(
                    args.b0_model_dir, args.train_method, **filters)
                res = b0_run(
                    args.data, args.b0_model_dir, args.train_method,
                    model_name=name,
                    no_stem_stride=no_stride, lsbr_reference=lsbr_ref,
                    batch_size=args.batch_size,
                    split=args.split, take_num_images=args.take)
            except (UserError, FileNotFoundError) as e:
                print(f"skipping B0 ns={no_stride} r={lsbr_ref}: {e}",
                      file=sys.stderr)
                continue
            config = load_config(
                args.b0_model_dir / args.train_method / name)
            res = res[(res["stego_method"].isna()) |
                      (res["alpha"].isin(args.alphas))].copy()
            res["model_name"] = b0_label(config)
            res["score"] = res["output"]
            frames.append(res)

    res = pd.concat(frames).reset_index(drop=True)
    res["stego_method"] = res["stego_method"].fillna("Cover")
    res["alpha"] = res["alpha"].fillna(0.0)
    df_roc = produce_roc(res)

    alpha = args.alphas[-1]
    outdir = args.results / "detection"
    outdir.mkdir(parents=True, exist_ok=True)
    df_auc = df_roc[["stego_method", "model_name", "auc", "p_e", "wauc",
                     "pmd_5fp", "tau0", "fpr_tau0", "tpr_tau0", "fpr_50",
                     "tpr_50"]].drop_duplicates()
    df_auc.to_csv(outdir / f"auc_{alpha}.csv", index=False)
    pivot = df_roc.pivot(index=["tau"],
                         columns=["stego_method", "model_name"],
                         values=["tpr", "fpr"])
    pivot.columns = ["_".join(c).strip() for c in pivot.columns.values]
    pivot.to_csv(outdir / f"roc_{alpha}.csv", index=False)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    for label, df_i in df_roc.groupby("label"):
        df_i = df_i.sort_values("tau")
        ax.plot(df_i["fpr"], df_i["tpr"], label=label)
    ax.plot([0, 1], [0, 1], linestyle="--", color="gray", label="Random")
    ax.set_xlabel("False Positive Rate (FPR)")
    ax.set_ylabel("True Positive Rate (TPR)")
    ax.legend(loc="lower right")
    fig.savefig(outdir / f"roc_{alpha}.png", bbox_inches="tight", dpi=300)
    print(df_auc.to_string())
    print(f"outputs saved to {outdir}")


def _cmd_simulate(args):
    import numpy as np
    import pandas as pd
    from PIL import Image
    import jax.numpy as jnp
    from .data import precovers, load_images
    from .data.simulate import simulate, image_key

    df = precovers(args.data)
    pixels = load_images(args.data, list(df["name"]))
    for alpha in args.alphas:
        outdir = (args.data /
                  f"stego_{args.method}_alpha_{alpha}_independent_images")
        outdir.mkdir(parents=True, exist_ok=True)
        rows = []
        for i, (_, row) in enumerate(df.iterrows()):
            key = image_key(row["name"])
            stego = np.asarray(simulate(
                jnp.asarray(pixels[i][None]), args.method, alpha, key))[0]
            name = pathlib.Path(row["name"]).name
            Image.fromarray(stego).save(outdir / name)
            rows.append({
                "name": f"{outdir.name}/{name}",
                "height": stego.shape[0], "width": stego.shape[1],
                "stego_method": args.method.upper().rstrip("R") + "R",
                "alpha": alpha,
            })
        pd.DataFrame(rows).to_csv(outdir / "files.csv", index=False)
        print(f"wrote {len(rows)} stego images to {outdir}")


if __name__ == "__main__":
    sys.exit(main())
