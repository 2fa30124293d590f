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


def test_pause_contenders_stops_and_resumes(tmp_path, monkeypatch):
    """bench pauses pids registered in the pause file for the duration of
    the run (a background CPU-bound sweep on the 1-core host halves codec
    MB/s), resumes them after, and never touches its own ancestors or dead
    pids."""
    import os
    import signal
    import subprocess
    import time

    # the registered pid spawns a child: SIGSTOP does not propagate, so
    # the guard must expand to descendants (a stopped bash wrapper left
    # its python sweep child burning the core — observed live)
    proc = subprocess.Popen(
        [sys.executable, "-c",
         "import subprocess, sys, time\n"
         "c = subprocess.Popen([sys.executable, '-c',"
         " 'import time; time.sleep(60)'])\n"
         "print(c.pid, flush=True)\n"
         "time.sleep(60)"],
        stdout=subprocess.PIPE, text=True)
    try:
        child_pid = int(proc.stdout.readline())
        pause_file = tmp_path / "pause.pids"
        # one live target, one dead pid, one ancestor (our own parent)
        pause_file.write_text(f"{proc.pid}\n999999\n{os.getppid()}\n")
        monkeypatch.setattr(bench, "PAUSE_FILE", str(pause_file))

        def state_of(pid):
            return open(f"/proc/{pid}/stat").read().rsplit(")", 1)[1].split()[0]

        stopped = bench._pause_contenders()
        assert stopped == [proc.pid, child_pid]
        for pid in (proc.pid, child_pid):
            for _ in range(50):
                if state_of(pid) == "T":
                    break
                time.sleep(0.02)
            assert state_of(pid) == "T", pid
        bench._resume_contenders(stopped)
        for pid in (proc.pid, child_pid):
            for _ in range(50):
                if state_of(pid) != "T":
                    break
                time.sleep(0.02)
            assert state_of(pid) != "T", pid
    finally:
        proc.kill()
        try:
            os.kill(child_pid, signal.SIGKILL)
        except OSError:
            pass
        proc.wait()


def test_sigterm_resumes_paused_contenders(tmp_path):
    """A SIGTERM (the driver's `timeout`) must not leave contenders
    SIGSTOPped: bench's __main__ converts it to SystemExit so the
    finally-resume runs. Observed live: a timeout-killed bench left the
    background RD sweep frozen."""
    import os
    import signal
    import subprocess
    import time

    sleeper = subprocess.Popen([sys.executable, "-c",
                                "import time; time.sleep(120)"])
    try:
        pause_file = tmp_path / "pause.pids"
        pause_file.write_text(f"{sleeper.pid}\n")
        # replicate bench's __main__ guard with a main() that hangs
        prog = (
            "import signal, sys, time\n"
            "sys.path.insert(0, %r)\n"
            "import bench\n"
            "bench.PAUSE_FILE = %r\n"
            "signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))\n"
            "paused = bench._pause_contenders()\n"
            "try:\n"
            "    print('paused', flush=True)\n"
            "    time.sleep(120)\n"
            "finally:\n"
            "    bench._resume_contenders(paused)\n"
        ) % (__file__.rsplit("/", 2)[0], str(pause_file))
        p = subprocess.Popen([sys.executable, "-c", prog],
                             stdout=subprocess.PIPE, text=True)
        assert p.stdout.readline().strip() == "paused"
        # the sleeper must now be stopped
        for _ in range(100):
            if open(f"/proc/{sleeper.pid}/stat").read().split()[2] == "T":
                break
            time.sleep(0.02)
        assert open(f"/proc/{sleeper.pid}/stat").read().split()[2] == "T"
        p.send_signal(signal.SIGTERM)
        assert p.wait(timeout=10) == 143
        for _ in range(100):
            if open(f"/proc/{sleeper.pid}/stat").read().split()[2] != "T":
                break
            time.sleep(0.02)
        assert open(f"/proc/{sleeper.pid}/stat").read().split()[2] != "T"
    finally:
        sleeper.kill()
        sleeper.wait()


def test_pause_contenders_missing_file(monkeypatch):
    monkeypatch.setattr(bench, "PAUSE_FILE", "/nonexistent/pause.pids")
    assert bench._pause_contenders() == []


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
