"""MetricsLogger: JSONL always-on; the wandb branch exercised with a stub
module (the package is absent in this image — reference SURVEY.md §5.5)."""

import json
import sys
import types

from sam2_video_tpu.utils.logging import MetricsLogger


def test_jsonl_logging_without_wandb(tmp_path):
    lg = MetricsLogger(tmp_path, use_wandb=False, config={"a": 1})
    lg.log({"train/loss": 1.5, "step": 1})
    lg.summary({"best": 0.5})
    lg.close()
    recs = [json.loads(l) for l in
            (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert recs[0]["train/loss"] == 1.5 and "_time" in recs[0]
    assert json.loads((tmp_path / "summary.json").read_text())["best"] == 0.5
    assert json.loads((tmp_path / "config.json").read_text())["a"] == 1


def test_wandb_branch_with_stub_module(tmp_path, monkeypatch):
    """Inject a fake ``wandb`` module and verify init/log/summary/finish are
    actually driven (the upload branch, never executable in this image)."""
    calls = {"init": [], "log": [], "summary": {}, "finish": 0}

    class _Run:
        summary = calls["summary"]

        def log(self, rec):
            calls["log"].append(rec)

        def finish(self):
            calls["finish"] += 1

    stub = types.ModuleType("wandb")
    stub.init = lambda **kw: (calls["init"].append(kw), _Run())[1]
    monkeypatch.setitem(sys.modules, "wandb", stub)

    lg = MetricsLogger(tmp_path, project="p", name="n", config={"x": 2})
    lg.log({"val/dice": 0.9})
    lg.summary({"final": 1.0})
    lg.close()

    assert calls["init"][0]["project"] == "p"
    assert calls["init"][0]["config"] == {"x": 2}
    assert calls["log"][0]["val/dice"] == 0.9
    assert calls["summary"]["final"] == 1.0
    assert calls["finish"] == 1
    # JSONL still written alongside the upload
    assert (tmp_path / "metrics.jsonl").exists()


def test_wandb_init_failure_degrades_to_jsonl(tmp_path, monkeypatch):
    stub = types.ModuleType("wandb")

    def boom(**kw):
        raise RuntimeError("no network")

    stub.init = boom
    monkeypatch.setitem(sys.modules, "wandb", stub)
    lg = MetricsLogger(tmp_path)
    lg.log({"ok": 1.0})
    lg.close()
    assert lg._wandb is None
    assert (tmp_path / "metrics.jsonl").exists()
