

def test_record_final_refuses_overwrite(tmp_path, monkeypatch):
    """Final bench records are immutable history: record_final writes a
    fresh name once and refuses an existing target (the round-8
    silent-overwrite defect, mechanically prevented)."""
    import json

    import tools.record_final as rf

    monkeypatch.setattr(rf, "REPO", tmp_path)
    (tmp_path / "bench_results").mkdir()
    src = tmp_path / "rolling.json"
    src.write_text(json.dumps({"value": 1.0}))

    dst = rf.record_final(src, "r99_final", note="quiet")
    assert json.loads(dst.read_text()) == {"value": 1.0, "note": "quiet"}

    src.write_text(json.dumps({"value": 2.0}))
    try:
        rf.record_final(src, "r99_final")
        raise AssertionError("expected FileExistsError")
    except FileExistsError:
        pass
    assert json.loads(dst.read_text())["value"] == 1.0
