"""Multi-statement SQL scripts (the reference's snappy-sql CLI shape)."""

import shutil

import pytest


def test_run_script_end_to_end(snappy):
    results = snappy.run_script(
        """
        -- managed table; the ; in this comment must not split
        CREATE TABLE rs_t (k INT NOT NULL, v STRING) USING row
            OPTIONS (key_columns 'k');
        INSERT INTO rs_t VALUES (1, 'a;b');        /* ; in literal + block */
        PUT INTO rs_t VALUES (1, 'it''s;fine');
        INSERT INTO rs_t VALUES (2, 'plain');
        SELECT k, v FROM rs_t ORDER BY k
        """
    )
    rows = results[-1].collect()
    assert [(r.k, r.v) for r in rows] == [(1, "it's;fine"), (2, "plain")]


def test_split_script_edges(snappy):
    split = snappy._split_script
    assert split("a; b ;; c") == ["a", "b", "c"]
    assert split("SELECT ';' AS x; SELECT 2") == ["SELECT ';' AS x", "SELECT 2"]
    assert split('SELECT ";" ; SELECT 1') == ['SELECT ";"', "SELECT 1"]
    assert split("x -- c;d\n; y") == ["x", "y"]
    assert split("x /* ; */; y") == ["x", "y"]
    assert split("SELECT 'it''s; ok'") == ["SELECT 'it''s; ok'"]


def test_table_reads_survive_missing_history(snappy, sf_dir):
    # history is an add-on: deleting it must not affect current reads
    base = snappy.spark.read.parquet(f"{sf_dir}/orders.parquet").limit(20)
    snappy.create_table("rs_hist", options={"key_columns": "o_orderkey"}, df=base)
    key = base.select("o_orderkey").collect()[0].o_orderkey
    snappy.sql(f"DELETE FROM rs_hist WHERE o_orderkey = {key}")
    shutil.rmtree(snappy._history_dir("rs_hist"))
    assert snappy.table("rs_hist").count() == 19
    assert snappy.table_history("rs_hist") == []
    with pytest.raises(ValueError):
        snappy.table_version("rs_hist", 1)


def test_interactive_command_shims(snappy, capsys):
    """snappy-CLI interactive commands inside a script
    (interactive_commands/elapsedtime.md, maximumdisplaywidth.md):
    elapsedtime on records + echoes per-statement wall via the
    SET_STATISTICS_TIMING machinery; maximumdisplaywidth clamps the
    session's display width used by show_df."""
    results = snappy.run_script(
        """
        elapsedtime on;
        maximumdisplaywidth 1000;
        CREATE TABLE rs_ic (k int, v string) USING COLUMN;
        INSERT INTO rs_ic VALUES (1, 'aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa');
        SELECT k, v FROM rs_ic ORDER BY k;
        elapsedtime off
        """
    )
    assert results[0] is None and results[1] is None  # command shims
    assert [(r.k,) for r in results[-2].collect()] == [(1,)]
    out = capsys.readouterr().out
    assert out.count("ELAPSED TIME =") == 3  # one per real statement
    assert snappy.max_display_width == 1000
    # the timing substance went through the statistics-timing machinery
    stats = snappy.get_statement_stats()
    assert any("INSERT INTO rs_ic" in s for s, _ in stats)
    # show_df honors the width: the 30-char value prints untruncated
    snappy.show_df(snappy.table("rs_ic"))
    shown = capsys.readouterr().out
    assert "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa" in shown
    snappy.run_script("maximumdisplaywidth 4")
    snappy.show_df(snappy.table("rs_ic"))
    shown4 = capsys.readouterr().out
    assert "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa" not in shown4
    snappy.sql("DROP TABLE rs_ic")
