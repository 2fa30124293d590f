"""The driver records bench.py's single JSON line as the round's perf
record. When the TPU backend is unreachable (the axon tunnel goes down for
hours at a time — it cost round 3 its entire record), bench.py must still
emit exactly one line carrying the host-side codec metrics, and must still
exit non-zero so the degradation is unmistakable."""
import io
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import pytest

import bench


def test_codec_only_record_on_probe_failure(monkeypatch, capsys):
    def failing_probe(*a, **k):
        raise RuntimeError("device backend unreachable (test)")

    monkeypatch.setattr(bench, "_probe_device", failing_probe)
    with pytest.raises(RuntimeError) as exc_info:
        bench.main()
    assert getattr(exc_info.value, "already_recorded", False)

    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, out
    rec = json.loads(out[0])
    assert rec["metric"] == "render_rays_per_sec_per_chip"
    assert rec["value"] == 0.0
    assert "unreachable" in rec["error"]
    assert "codec-only" in rec["degraded"]
    em = rec["extra_metrics"]
    assert em["codec_encode_MBps"] > 0
    assert em["codec_decode_MBps"] > 0
    assert 0 < em["compression_ratio_qp20"] < 1


def test_main_guard_does_not_double_print(monkeypatch, capsys):
    """__main__'s catch-all must not re-print a line the degraded path
    already recorded."""
    def failing_probe(*a, **k):
        raise RuntimeError("down (test)")

    monkeypatch.setattr(bench, "_probe_device", failing_probe)
    # replicate the __main__ wrapper
    with pytest.raises(RuntimeError):
        try:
            bench.main()
        except Exception as exc:
            if getattr(exc, "already_recorded", False):
                raise
            print(json.dumps({"error": str(exc)}))
            raise
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, out
