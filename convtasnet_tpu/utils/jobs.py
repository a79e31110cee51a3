"""Local array-job launcher with log capture.

Capability parity with the vendored Kaldi ``run.pl``
(``egs/wsj0/utils/run.pl``): run ``JOB=1:N`` array jobs as local processes,
capture each job's stdout/stderr to ``<log>.JOB.log``-style files, propagate
failures, and report how many jobs failed. GridEngine submission
(``queue.pl``) is out of scope — cluster scheduling for TPU pods is handled
by the TPU runtime + ``jax.distributed``, not by qsub.
"""

from __future__ import annotations

import os
import subprocess
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional


class JobError(RuntimeError):
    pass


def run_jobs(
    command: str,
    n_jobs: int = 1,
    log: str = "run.JOB.log",
    job_name: str = "JOB",
    max_parallel: Optional[int] = None,
    env: Optional[dict] = None,
) -> List[int]:
    """Run ``command`` for JOB = 1..n_jobs, substituting ``job_name``.

    Args:
        command: shell command; occurrences of ``job_name`` are replaced with
            the 1-based job index (run.pl's JOB=1:N convention).
        log: log path template, ``job_name`` substituted per job.
        max_parallel: concurrent jobs (default: all).

    Returns:
        list of exit codes (all zero on success).

    Raises:
        JobError if any job fails, naming the failing logs (run.pl's
        "failed, log is in ..." behavior).
    """

    def run_one(job: int) -> int:
        cmd = command.replace(job_name, str(job))
        log_path = log.replace(job_name, str(job))
        os.makedirs(os.path.dirname(os.path.abspath(log_path)), exist_ok=True)
        with open(log_path, "w") as f:
            f.write(f"# {cmd}\n# Started {__import__('time').ctime()}\n")
            f.flush()
            proc = subprocess.run(
                cmd, shell=True, stdout=f, stderr=subprocess.STDOUT,
                env={**os.environ, **(env or {})})
            f.write(f"# Exit code {proc.returncode}\n")
        return proc.returncode

    workers = max_parallel or n_jobs
    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        codes = list(pool.map(run_one, range(1, n_jobs + 1)))
    failed = [j + 1 for j, c in enumerate(codes) if c != 0]
    if failed:
        logs = ", ".join(log.replace(job_name, str(j)) for j in failed[:3])
        raise JobError(
            f"{len(failed)}/{n_jobs} jobs failed; see logs: {logs}")
    return codes
