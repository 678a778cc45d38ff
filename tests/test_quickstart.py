"""examples/quickstart.py smoke: the documented one-command workflow
(toy data → train → translate → AOT artifact) must stay runnable."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_quickstart_end_to_end(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "examples"))
    try:
        import quickstart
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "qs")
    quickstart.main(["--outdir", out, "--size", "32", "--dim", "8",
                     "--iters", "4", "--batch", "2",
                     "--n-train", "8", "--n-test", "2"])
    run = os.path.join(out, "outputs", "quickstart")
    assert os.path.exists(os.path.join(run, "metrics.jsonl"))
    translated = sorted(os.listdir(os.path.join(out, "translated")))
    assert "output000.jpg" in translated and "output001.jpg" in translated
    assert os.path.getsize(os.path.join(out, "model.jexp.zip")) > 1000
