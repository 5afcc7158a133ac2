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


def test_run_nested_script_files(snappy, tmp_path):
    """`run 'file.sql'` (interactive_commands/run.md): nested script
    files execute inline, relative paths resolve against the INCLUDING
    script's directory, and environment changes (tables, display width)
    persist when the outer script resumes."""
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "inner.sql").write_text(
        "INSERT INTO rs_run VALUES (2, 'from-inner');\n"
        "maximumdisplaywidth 77;\n"
        "run 'leaf.sql';\n"
    )
    (sub / "leaf.sql").write_text("INSERT INTO rs_run VALUES (3, 'from-leaf');\n")
    (tmp_path / "outer.sql").write_text(
        "CREATE TABLE rs_run (k INT, v STRING) USING row;\n"
        "INSERT INTO rs_run VALUES (1, 'outer');\n"
        "run 'sub/inner.sql';\n"
        "SELECT k, v FROM rs_run ORDER BY k;\n"
    )
    results = snappy.run_script_file(str(tmp_path / "outer.sql"))
    rows = [(r.k, r.v) for r in results[-1].collect()]
    assert rows == [(1, "outer"), (2, "from-inner"), (3, "from-leaf")]
    assert snappy.max_display_width == 77  # inner env change persisted
    snappy.sql("DROP TABLE rs_run")


def test_run_cycle_is_bounded(snappy, tmp_path):
    (tmp_path / "a.sql").write_text("run 'b.sql';\n")
    (tmp_path / "b.sql").write_text("run 'a.sql';\n")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="depth"):
        snappy.run_script_file(str(tmp_path / "a.sql"))


def test_exit_halts_outermost_loop(snappy, tmp_path):
    """exit.md: EXIT inside a run-included file halts the OUTERMOST
    loop — statements after the run command must not execute."""
    (tmp_path / "inner.sql").write_text(
        "INSERT INTO rs_exit VALUES (1);\nexit;\nINSERT INTO rs_exit VALUES (2);\n"
    )
    (tmp_path / "outer.sql").write_text(
        "CREATE TABLE rs_exit (k INT) USING row;\n"
        "run 'inner.sql';\n"
        "INSERT INTO rs_exit VALUES (3);\n"
    )
    snappy.run_script_file(str(tmp_path / "outer.sql"))
    assert [r.k for r in snappy.table("rs_exit").collect()] == [1]
    snappy.sql("DROP TABLE rs_exit")


def test_connect_disconnect_bookkeeping(snappy):
    """connect.md / set_connection.md / disconnect.md: connection
    bookkeeping so reference CLI scripts replay; every statement still
    executes against this session (single-store engine, documented)."""
    results = snappy.run_script(
        """
        connect 'jdbc:snappydata://localhost:1527/' as db1;
        connect 'jdbc:snappydata://other:1527/';
        show connections;
        set connection DB1;
        CREATE TABLE rs_conn (k INT) USING row;
        INSERT INTO rs_conn VALUES (42);
        disconnect all;
        SELECT k FROM rs_conn
        """
    )
    conns = {(r.name, r.url) for r in results[2].collect()}
    assert ("DB1", "jdbc:snappydata://localhost:1527/") in conns
    assert any(n.startswith("CONNECTION1") and n.endswith("*") for n, _ in conns)
    # work done "on" a named connection landed in this engine session
    assert [r.k for r in results[-1].collect()] == [42]
    assert snappy._cli_connections == {}
    snappy.sql("DROP TABLE rs_conn")


def test_elapsedtime_off_restores_timing_state(snappy):
    """r10 advice: 'elapsedtime off' must restore the timing state it
    found — a script's toggle must not pin SET_STATISTICS_TIMING on."""
    assert snappy._stats_timing is False
    snappy.run_script("elapsedtime on; SELECT 1; elapsedtime off")
    assert snappy._stats_timing is False
    # but a pre-existing SET_STATISTICS_TIMING(1) survives the toggle
    snappy.sql("CALL SYSCS_UTIL.SET_STATISTICS_TIMING(1)")
    snappy.run_script("elapsedtime on; SELECT 1; elapsedtime off")
    assert snappy._stats_timing is True
