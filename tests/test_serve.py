"""Latency-shaped batch-1 serving path (wsunet_tpu/serve.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from wsunet_tpu.models import get_model
from wsunet_tpu.ops import ws_estimate_unet
from wsunet_tpu.serve import UNetWSServer, measure_latency


def test_server_matches_eval_path_numerics():
    """The bf16 serving step must agree with the f32 eval path within
    bf16 predictor tolerance, on the same weights."""
    model = get_model("unet_2")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 1), jnp.float32))

    server = UNetWSServer(model, variables, size=64)
    beta_srv, l1_srv = server.predict(img)

    x = jnp.asarray(img, jnp.float32)[None]
    y = model.apply(variables, (x / 255.0)[..., None], deterministic=True)
    beta_ref, l1_ref = ws_estimate_unet(x, y[:, 1:-1, 1:-1, 0] * 255.0)
    # bf16 conv stack: ~3 decimal digits; the WS reduction itself is f32
    assert abs(beta_srv - float(beta_ref[0])) < 5e-3
    assert abs(l1_srv - float(l1_ref[0])) < 5e-1
    assert np.isfinite(beta_srv) and np.isfinite(l1_srv)


def test_measure_latency_reports_floor():
    model = get_model("unet_0")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 1), jnp.float32))
    server = UNetWSServer(model, variables, size=64)
    out = measure_latency(server, reps=3)
    assert {"latency_ms_b1", "rtt_floor_ms", "latency_ms_b1_net",
            "serial_images_per_sec", "streamed_images_per_sec",
            "stream_speedup"} <= set(out)
    assert out["latency_ms_b1"] > 0
    assert out["latency_ms_b1_net"] <= out["latency_ms_b1"]
    assert out["streamed_images_per_sec"] > 0


def test_predict_many_matches_serial_order():
    """The pipelined streaming path (VERDICT r4 item 9) must return the
    exact serial results, in order."""
    model = get_model("unet_0")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 1), jnp.float32))
    server = UNetWSServer(model, variables, size=64)
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 256, (64, 64), dtype=np.uint8)
            for _ in range(9)]
    serial = [server.predict(im) for im in imgs]
    streamed = list(server.predict_many(iter(imgs), depth=3))
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(serial))


def test_stream_paths_pipelined_errors_inline(tmp_path):
    """stream_paths keeps the serve-loop contract under pipelining:
    per-image failures (missing file, wrong shape) yield inline error
    rows keyed to the right name, results stay in input order."""
    from PIL import Image
    from wsunet_tpu.serve import stream_paths

    model = get_model("unet_0")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 1), jnp.float32))
    server = UNetWSServer(model, variables, size=64)

    rng = np.random.default_rng(2)
    good = []
    for i in range(3):
        p = tmp_path / f"g{i}.png"
        Image.fromarray(rng.integers(0, 256, (64, 64), dtype=np.uint8),
                        mode="L").save(p)
        good.append(str(p))
    bad_shape = tmp_path / "bad.png"
    Image.fromarray(rng.integers(0, 256, (32, 32), dtype=np.uint8),
                    mode="L").save(bad_shape)
    paths = [good[0], str(tmp_path / "missing.png"), good[1],
             str(bad_shape), good[2]]
    rows = list(stream_paths(server, paths, depth=2))
    assert [r["name"] for r in rows] == paths
    assert "beta_hat" in rows[0] and "beta_hat" in rows[2] \
        and "beta_hat" in rows[4]
    assert "error" in rows[1] and "error" in rows[3]


def test_cli_serve_roundtrip(tmp_path, capsys):
    """`wsunet_tpu serve` round-trip on the committed fixture model: one
    JSON line per input, per-image errors inline, loop never aborts."""
    import json
    import numpy as np
    from PIL import Image
    from wsunet_tpu.cli import main as cli_main
    from wsunet_tpu.io.imread import imread_gray_u8

    src = imread_gray_u8("/root/reference/data/images/6.png")
    p = tmp_path / "crop64.png"
    Image.fromarray(src[:64, :64].astype(np.uint8), mode="L").save(p)

    rc = cli_main(["serve", str(p), str(tmp_path / "missing.png"),
                   "--size", "64", "--dtype", "float32"])
    assert rc == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2
    assert lines[0]["name"] == str(p)
    assert np.isfinite(lines[0]["beta_hat"])
    assert np.isfinite(lines[0]["l1"])
    assert "error" in lines[1] and "beta_hat" not in lines[1]


def test_cli_serve_shape_mismatch_reports_not_crashes(tmp_path, capsys):
    import json
    from wsunet_tpu.cli import main as cli_main
    rc = cli_main(["serve", "/root/reference/data/images/6.png",
                   "--size", "64", "--dtype", "float32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert "512x512" in out["error"] and "--size" in out["error"]
