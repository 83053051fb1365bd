"""JPEG cover-dataset path (reference `fabrika.covers`, jpegs* dirs)."""

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from wsunet_tpu.data import covers, iterate_batches


@pytest.fixture()
def jpeg_root(tmp_path, data_root):
    d = tmp_path / "jpegs_512"
    d.mkdir()
    rows = []
    for i in (6, 7):
        src = np.array(Image.open(data_root / "images" / f"{i}.png"))
        for q in (75, 95):
            name = f"{i}_q{q}.jpg"
            Image.fromarray(src).save(d / name, quality=q)
            rows.append({"name": f"jpegs_512/{name}", "height": 512,
                         "width": 512, "quality": f"q{q}"})
    pd.DataFrame(rows).to_csv(d / "files.csv", index=False)
    return tmp_path


def test_covers_quality_filter(jpeg_root):
    df = covers(jpeg_root, quality=75)
    assert len(df) == 2
    assert all(df["quality"] == "q75")
    df_all = covers(jpeg_root)
    assert len(df_all) == 4


def test_jpeg_batches_decode(jpeg_root):
    df = covers(jpeg_root, quality=95)
    batches = list(iterate_batches(jpeg_root, df, batch_size=4))
    assert batches[0].pixels.shape == (4, 512, 512)
    assert batches[0].mask.tolist() == [True, True, False, False]
    # JPEG q95 of a grayscale image stays close to the source
    assert batches[0].pixels.dtype == np.uint8
