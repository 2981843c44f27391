"""bench.py relay-outage resilience (VERDICT r3 item 2): backend-init
failures matching the 2026-08-17 outage signatures must be retried with
backoff, and the script must ALWAYS emit exactly one parseable JSON line —
a result on success, {"error": ...} on final failure — never a raw
traceback. The retry machinery is exercised against stub inner commands
(no TPU involved); the end-to-end kill-test runs the real bench body on
CPU with one injected fake outage."""

import json
import os
import subprocess
import sys


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")

sys.path.insert(0, REPO)


def _stub(tmp_path, body: str) -> list[str]:
    p = tmp_path / "stub.py"
    p.write_text(body)
    return [sys.executable, str(p)]


def _run_retry(cmd, schedule, capsys):
    import bench
    rc = bench.run_with_retry(cmd, schedule=schedule)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"expected exactly one stdout JSON line, got {out}"
    return rc, json.loads(out[0])


def test_retry_recovers_from_fake_outage(tmp_path, capsys):
    counter = tmp_path / "fails"
    counter.write_text("2")
    cmd = _stub(tmp_path, f"""
import json, sys
n = int(open({str(counter)!r}).read().strip())
if n > 0:
    open({str(counter)!r}, "w").write(str(n - 1))
    sys.stderr.write("RuntimeError: Unable to initialize backend 'tpu': UNAVAILABLE\\n")
    sys.exit(1)
print("compile log noise")
print(json.dumps({{"metric": "m", "value": 1.5, "unit": "u"}}))
""")
    rc, out = _run_retry(cmd, [0.05, 0.05, 0.05], capsys)
    assert rc == 0
    assert out["value"] == 1.5
    assert out["attempts"] == 3  # 2 fake outages + the success


def test_final_failure_emits_structured_json(tmp_path, capsys):
    cmd = _stub(tmp_path, """
import sys
sys.stderr.write("jaxlib...: UNAVAILABLE: connection to relay lost\\n")
sys.exit(1)
""")
    rc, out = _run_retry(cmd, [0.05], capsys)
    assert rc == 1
    assert out["error"] == "relay_unavailable"
    assert out["value"] is None
    assert out["attempts"] == 2
    assert "UNAVAILABLE" in out["last_error"]


def test_non_retryable_fails_once(tmp_path, capsys):
    cmd = _stub(tmp_path, """
import sys
sys.stderr.write("TypeError: something unrelated\\n")
sys.exit(1)
""")
    rc, out = _run_retry(cmd, [0.05, 0.05], capsys)
    assert rc == 1
    assert out["error"] == "bench_failed"
    assert out["attempts"] == 1  # no retries burned on a code bug


def test_end_to_end_kill_test_on_cpu(tmp_path):
    """The real bench body (tiny sizes, CPU backend) behind one injected
    outage: the wrapper must retry once and deliver a real measurement."""
    counter = tmp_path / "fails"
    counter.write_text("1")
    env = dict(os.environ,
               SSV_BENCH_CPU="1", SSV_BENCH_BATCH="8", SSV_BENCH_STEPS="2",
               SSV_BENCH_NTRAIN="32", SSV_BENCH_RETRY_SCHEDULE="0.1,0.1",
               SSV_BENCH_FAIL_COUNTER=str(counter))
    proc = subprocess.run([sys.executable, BENCH], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=900)
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert len(lines) == 1, lines
    out = json.loads(lines[0])
    assert out["attempts"] == 2
    assert out["value"] and out["value"] > 0
    assert out["vs_baseline"] is None  # batch 8 != baseline batch 512
    assert counter.read_text().strip() == "0"
