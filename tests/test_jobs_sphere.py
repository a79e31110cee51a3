"""Array-job launcher (run.pl parity) and NIST SPHERE reader tests."""

import os

import numpy as np
import pytest

from convtasnet_tpu.utils.jobs import JobError, run_jobs
from convtasnet_tpu.data.audio_io import read_wav


def test_run_jobs_substitutes_and_logs(tmp_path):
    out = tmp_path / "out"
    os.makedirs(out)
    codes = run_jobs(
        f"echo job-JOB && touch {out}/f.JOB",
        n_jobs=4,
        log=str(tmp_path / "logs" / "run.JOB.log"))
    assert codes == [0, 0, 0, 0]
    assert sorted(os.listdir(out)) == ["f.1", "f.2", "f.3", "f.4"]
    log1 = open(tmp_path / "logs" / "run.1.log").read()
    assert "job-1" in log1 and "Exit code 0" in log1


def test_run_jobs_propagates_failure(tmp_path):
    with pytest.raises(JobError) as e:
        run_jobs("test JOB -ne 2", n_jobs=3,
                 log=str(tmp_path / "run.JOB.log"))
    assert "1/3 jobs failed" in str(e.value)
    assert "Exit code 1" in open(tmp_path / "run.2.log").read()


def _write_sphere(path, samples, sr=16000, coding="pcm"):
    body = (samples * 32767).astype("<i2").tobytes()
    fields = (
        f"sample_rate -i {sr}\n"
        f"channel_count -i 1\n"
        f"sample_count -i {len(samples)}\n"
        f"sample_n_bytes -i 2\n"
        f"sample_byte_format -s2 01\n"
        f"sample_coding -s{len(coding)} {coding}\n"
        "end_head\n")
    head = "NIST_1A\n   1024\n" + fields
    head = head.encode("ascii")
    head = head + b" " * (1024 - len(head))
    with open(path, "wb") as f:
        f.write(head)
        f.write(body)


def test_read_sphere_pcm(tmp_path):
    x = np.sin(np.linspace(0, 20, 8000)).astype(np.float32) * 0.5
    p = str(tmp_path / "a.sph")
    _write_sphere(p, x)
    y, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1e-4)
    # with resampling
    y2, sr2 = read_wav(p, sample_rate=8000)
    assert sr2 == 8000 and y2.shape[0] == 4000


def test_read_sphere_shorten_garbage_payload_rejected(tmp_path):
    """Shorten-coded SPHERE is now decoded natively (tests/test_shorten.py);
    a corrupt payload must still fail loudly, not produce garbage audio."""
    x = np.zeros(100, np.float32)
    p = str(tmp_path / "b.sph")
    _write_sphere(p, x, coding="pcm,embedded-shorten-v2.00")
    with pytest.raises(ValueError, match="magic"):
        read_wav(p)  # payload is raw PCM, not a shorten stream


def test_submit_local_and_template(tmp_path):
    from convtasnet_tpu.utils.jobs import JobError, submit, submit_jobs

    log = str(tmp_path / "logs" / "ok.log")
    assert submit("echo stage-done", log) == 0
    assert "stage-done" in open(log).read()

    # a blocking scheduler template (degenerate local scheduler)
    log2 = str(tmp_path / "logs" / "tpl.log")
    assert submit("echo via-template", log2,
                  cmd_template="bash {script} > {log} 2>&1") == 0
    assert "via-template" in open(log2).read()
    assert os.path.exists(log2 + ".sh")  # submitted script written

    # failure propagation names the log
    with pytest.raises(JobError, match="bad.log"):
        submit("exit 3", str(tmp_path / "logs" / "bad.log"),
               cmd_template="bash {script} > {log} 2>&1")

    # array submission with JOB substitution
    logs = str(tmp_path / "logs" / "arr.JOB.log")
    codes = submit_jobs("echo job-JOB", 3, logs,
                        cmd_template="bash {script} > {log} 2>&1")
    assert codes == [0, 0, 0]
    assert "job-2" in open(str(tmp_path / "logs" / "arr.2.log")).read()
