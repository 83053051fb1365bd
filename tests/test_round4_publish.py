"""The README/PARITY holdout-table splice is marker-bounded and
idempotent, so re-publishing after a results regeneration rewrites the
block in place without touching surrounding prose."""
import pathlib
import shutil
import sys

import pandas as pd

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts import round4_publish as pub  # noqa: E402


def _docs(tmp_path):
    for doc in ["README.md", "PARITY.md"]:
        shutil.copy(REPO / doc, tmp_path / doc)
    return [tmp_path / "README.md", tmp_path / "PARITY.md"]


def test_splice_inserts_and_is_idempotent(tmp_path):
    docs = _docs(tmp_path)
    csv = tmp_path / "auc.csv"
    pd.DataFrame({"stego_method": ["LSBR"], "model_name": ["KB"],
                  "auc": [0.733], "p_e": [0.167]}).to_csv(csv, index=False)
    block = pub.render(csv)
    for p in docs:
        before = p.read_text()
        pub.splice(p, block)
        after = p.read_text()
        assert "| LSBR | KB | 0.733" in after
        assert after.split(pub.START)[0] == before.split(pub.START)[0]
        assert after.split(pub.END)[1] == before.split(pub.END)[1]
        pub.splice(p, block)
        assert p.read_text() == after


def test_missing_csv_is_a_noop(tmp_path, capsys, monkeypatch):
    # main() must not raise (the watcher calls it unattended) and must
    # not modify the docs when the holdout CSV is absent
    docs = _docs(tmp_path)
    texts = [p.read_text() for p in docs]
    monkeypatch.setattr(pub, "REPO", tmp_path)
    assert pub.main(tmp_path / "nope.csv") == 1
    assert [p.read_text() for p in docs] == texts
