"""Per-stage rows/bytes evidence for pipeline_end_to_end across SFs.

The 100 TB claim for the composed pipeline ("no stage scales
super-linearly; text never rides a shuffle") is a plan-shape argument —
this tool turns it into NUMBERS: it runs pipeline_end_to_end at one
sf_dir and extracts, from the SQL metrics of every execution the run
triggers (including the pipeline's internal prefix-sum collect), each
Exchange's `shuffle bytes written` / `data size` and each operator's
`number of output rows`.

Compare across sf0.1 / sf1 / sf10 (gen_sf.py x10 / x100):

    python tools/pipeline_stage_stats.py /root/testdata/sf0.1  /tmp/pss_01.json
    python tools/pipeline_stage_stats.py /tmp/sfgen/sf1        /tmp/pss_1.json
    python tools/pipeline_stage_stats.py /tmp/sfgen/sf10       /tmp/pss_10.json

Linear-or-better scaling shows as: total shuffle bytes ~ O(rows), the
largest single exchange ~ O(rows), and per-operator row counts growing
by exactly the replication factor (never its square).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_UNITS = {
    "B": 1,
    "KiB": 1024,
    "MiB": 1024**2,
    "GiB": 1024**3,
    "TiB": 1024**4,
}


def parse_size(s: str) -> int | None:
    """'216.0 B' / '1.5 MiB' / 'total (min, med, max...)\\n1.5 MiB (...)'"""
    m = re.search(r"([\d.,]+)\s*(B|KiB|MiB|GiB|TiB)", s)
    if not m:
        return None
    return int(float(m.group(1).replace(",", "")) * _UNITS[m.group(2)])


def parse_count(s: str) -> int | None:
    m = re.search(r"[\d,]+", s)
    return int(m.group(0).replace(",", "")) if m else None


def collect_execution(ss, eid: int) -> dict:
    mets = ss.executionMetrics(eid)
    g = ss.planGraph(eid)
    nodes = g.allNodes()
    out = {"execution_id": eid, "nodes": []}
    for i in range(nodes.size()):
        n = nodes.apply(i)
        rec = {"node": n.name()}
        nm = n.metrics()
        for j in range(nm.size()):
            m = nm.apply(j)
            v = mets.get(m.accumulatorId())
            if v.isEmpty():
                continue
            val = v.get()
            name = m.name()
            if name == "number of output rows":
                rec["rows"] = parse_count(val)
            elif name == "shuffle bytes written":
                rec["shuffle_bytes"] = parse_size(val)
            elif name == "data size":
                rec["data_size"] = parse_size(val)
        if len(rec) > 1:
            out["nodes"].append(rec)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from snappydata_spark import get_spark
    from snappydata_spark.operators import QUERIES

    spark = get_spark("pipeline-stage-stats")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm JVM/IO
    ss = spark._jsparkSession.sharedState().statusStore()
    before = {
        ss.executionsList().apply(i).executionId()
        for i in range(ss.executionsList().size())
    }
    t0 = time.time()
    n_out = QUERIES["pipeline_end_to_end"](spark, sf_dir).count()
    wall = round(time.time() - t0, 3)
    time.sleep(1.0)  # let the status listener drain
    execs = []
    lst = ss.executionsList()
    for i in range(lst.size()):
        eid = lst.apply(i).executionId()
        if eid not in before:
            execs.append(collect_execution(ss, eid))

    total_shuffle = sum(
        n.get("shuffle_bytes", 0) or 0 for e in execs for n in e["nodes"]
    )
    exchanges = sorted(
        (
            n["shuffle_bytes"]
            for e in execs
            for n in e["nodes"]
            if n.get("shuffle_bytes")
        ),
        reverse=True,
    )
    max_rows = max(
        (n["rows"] for e in execs for n in e["nodes"] if n.get("rows")),
        default=0,
    )
    result = {
        "sf_dir": sf_dir,
        "wall_sec": wall,
        "result_rows": n_out,
        "n_executions": len(execs),
        "total_shuffle_bytes": total_shuffle,
        "n_exchanges": len(exchanges),
        "max_exchange_bytes": exchanges[0] if exchanges else 0,
        "max_operator_rows": max_rows,
        "executions": execs,
    }
    line = json.dumps(result)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line)
    summary = {k: v for k, v in result.items() if k != "executions"}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
