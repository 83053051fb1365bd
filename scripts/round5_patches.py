"""Patch-cover datasets for the data-bound ablation's extended n-axis
(VERDICT r4 item 3: "Tile the 5 fixture covers into 256^2 (20) and 128^2
(80) patches ... rerun the committed curriculum at n in {2,3,4,~16,~64}").

Tiles the four ablation training covers {6,7,8,9} (cover 10 stays the
untouched holdout) from /root/reference/data/images into non-overlapping
square patches and writes them as standalone cover datasets:

  data_ablation/p256/images/  16 patches (4 per cover), 256x256
  data_ablation/p128/images/  64 patches (16 per cover), 128x128

Each dataset carries files.csv (reference data/images/files.csv schema:
name,height,width) plus two split CSVs:

  split_tr.csv  all patches (the n=16 / n=64 training covers)
  split_va.csv  the patches of cover 6 (validation stays inside the
                training set, same as the committed n=4 ablation point
                which validates on cover 6; scripts/round4_ablation.py)

Stego is NOT materialized: the trainers synthesize LSBr/HILLr on device
from cover batches (wsunet_tpu/train/train_b0.py), so a cover-only
catalog is a complete training dataset.  Deterministic (pure tiling, no
randomness); rerunning overwrites identical bytes.
"""
import pathlib
import sys

import numpy as np
from PIL import Image

REPO = pathlib.Path(__file__).resolve().parent.parent
SRC = pathlib.Path("/root/reference/data/images")
OUT = REPO / "data_ablation"
COVERS = [6, 7, 8, 9]


def tile(patch: int) -> pathlib.Path:
    root = OUT / f"p{patch}"
    img_dir = root / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    rows, va_rows = [], []
    for cover in COVERS:
        x = np.asarray(Image.open(SRC / f"{cover}.png").convert("L"))
        assert x.shape == (512, 512), x.shape
        n = 512 // patch
        for i in range(n):
            for j in range(n):
                tile_px = x[i * patch:(i + 1) * patch,
                            j * patch:(j + 1) * patch]
                name = f"images/{cover}_{i}{j}.png"
                Image.fromarray(tile_px).save(root / name)
                row = f"{name},{patch},{patch}"
                rows.append(row)
                if cover == 6:
                    va_rows.append(row)
    (img_dir / "files.csv").write_text(
        "name,height,width\n" + "\n".join(rows) + "\n")
    # split CSVs use the stego-aware schema so `precovers(split=...)`
    # filters them identically to the bundled splits
    hdr = "name,height,width,stego_method,alpha\n"
    (root / "split_tr.csv").write_text(
        hdr + "\n".join(f"{r},," for r in rows) + "\n")
    (root / "split_va.csv").write_text(
        hdr + "\n".join(f"{r},," for r in va_rows) + "\n")
    print(f"{root}: {len(rows)} patches ({len(va_rows)} val)")
    return root


if __name__ == "__main__":
    for p in (256, 128) if len(sys.argv) < 2 else [int(sys.argv[1])]:
        tile(p)
