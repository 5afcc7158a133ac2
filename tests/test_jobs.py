"""Jobs API lifecycle (SnappySQLJob trait, SnappySessionFactory.scala:
112-155): validate-then-run against the engine session, file-submitted
Python jobs, validation rejection."""

import pytest

from snappydata_spark.jobs import (
    JobValidationError,
    SnappyJobInvalid,
    SnappyJobValid,
    run_job,
    run_python_job,
)


class _CountJob:
    def is_valid_job(self, session, config):
        if "table" not in config:
            return SnappyJobInvalid("missing 'table' in config")
        return SnappyJobValid()

    def run_snappy_job(self, session, config):
        return session.table(config["table"]).count()


def test_run_job_lifecycle(snappy):
    df = snappy.spark.range(7).selectExpr("id AS k")
    snappy.create_table("job_t", df=df)
    assert run_job(snappy, _CountJob(), {"table": "job_t"}) == 7
    with pytest.raises(JobValidationError, match="missing 'table'"):
        run_job(snappy, _CountJob(), {})
    snappy.drop_table("job_t")


def test_run_job_camelcase_and_plain(snappy):
    class J:
        def runSnappyJob(self, session, config):  # reference spelling
            return session.sql("SELECT 1 AS one").collect()[0].one

    assert run_job(snappy, J()) == 1
    with pytest.raises(TypeError, match="run_snappy_job"):
        run_job(snappy, object())


def test_run_python_job_from_file(snappy, tmp_path):
    job = tmp_path / "myjob.py"
    job.write_text(
        "def run_snappy_job(session, config):\n"
        "    session.sql(\"CREATE TABLE pyjob_t (k INT) USING COLUMN\")\n"
        "    session.sql(\"INSERT INTO pyjob_t VALUES (1), (2), (3)\")\n"
        "    return session.table('pyjob_t').count()\n"
    )
    assert run_python_job(snappy, str(job)) == 3
    assert snappy.table("pyjob_t").count() == 3
    snappy.drop_table("pyjob_t")
