"""Jobs API — the snappy-job submit surface (SnappySQLJob trait,
cluster/src/main/scala/org/apache/spark/sql/SnappySessionFactory.scala:
112-155: validate → isValidJob, runJob → runSnappyJob(snSession, config);
SnappyJobValid/SnappyJobInvalid:150-155), re-expressed for Python.

A job is anything that exposes ``run_snappy_job(session, config)`` (the
reference's camelCase ``runSnappyJob`` is accepted too) and optionally
``is_valid_job(session, config)`` returning SnappyJobValid/Invalid.
``run_job`` drives the validate → run lifecycle against an engine
SnappySession; ``run_python_job`` loads a job from a .py file the way
snappy-job.sh submits a jar — the file's module-level callables are the
job (dependency jars map to DEPLOY JAR / sparkContext.addPyFile).

No job *server* is implied (the reference embeds spark-jobserver in the
lead — a cluster-runtime concern out of scope here, SURVEY §8); the
lifecycle contract and the config plumbing are what user jobs depend on.
"""

from __future__ import annotations

import importlib.util
import uuid
from dataclasses import dataclass


@dataclass
class SnappyJobValid:
    """isValidJob success marker (SnappySessionFactory.scala:153)."""


@dataclass
class SnappyJobInvalid:
    """isValidJob rejection with a reason (SnappySessionFactory.scala:155)."""

    reason: str


class JobValidationError(ValueError):
    """Raised by run_job when the job's validator rejects the config."""


def _attr(job, *names):
    for n in names:
        fn = getattr(job, n, None)
        if callable(fn):
            return fn
    return None


def run_job(session, job, config: dict | None = None):
    """validate → run lifecycle (SnappySQLJob.validate/runJob,
    SnappySessionFactory.scala:115-132).  `job` is a module, class
    instance, or any object with run_snappy_job/runSnappyJob."""
    config = dict(config or {})
    validate = _attr(job, "is_valid_job", "isValidJob")
    if validate is not None:
        status = validate(session, config)
        if isinstance(status, SnappyJobInvalid):
            raise JobValidationError(status.reason)
        if status is not None and not isinstance(status, SnappyJobValid):
            raise JobValidationError("is_valid_job must return SnappyJobValid/Invalid")
    run = _attr(job, "run_snappy_job", "runSnappyJob")
    if run is None:
        raise TypeError("job has no run_snappy_job/runSnappyJob callable")
    return run(session, config)


def run_python_job(session, path: str, config: dict | None = None):
    """Load a job from a .py file and run it — the snappy-job.sh submit
    analogue for Python sources.  The module is loaded under a unique
    name so repeated submissions of edited files don't collide."""
    spec = importlib.util.spec_from_file_location(
        f"snappy_job_{uuid.uuid4().hex[:8]}", path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return run_job(session, mod, config)
