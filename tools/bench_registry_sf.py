"""Full-registry scale sweep: run EVERY registered query at a given
sf_dir, recording wall seconds + output rows per query — the evidence
artifact for sf1->sf10 slope analysis (BENCH_SF10.md).

Unlike bench.py (headline timing at the driver's sf0.1, warm+cold
lanes), this is a single cold pass per query with a per-query timeout
guard: at rehearsal scale the question is "does any plan flip to a
scale-killer shape?", not steady-state latency.

Usage: python tools/bench_registry_sf.py <sf_dir> <out_json> \
           [name_prefixes] [skip_names]

`skip_names` (comma-separated exact names) are never (re)run — for
rehearsal rows that are KNOWN fatal at this scale (e.g. the
member-granularity ingestion gate whose output is quadratic under
gen_sf's verbatim mirroring): a fatal spill/OOM poisons the JVM for
several queries after it, so the honest artifact records their err row
once and measures everything else in an uncontaminated session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    # comma-separated name prefixes; a query runs if ANY matches
    name_filter = sys.argv[3].split(",") if len(sys.argv) > 3 else []
    skip_names = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else set()

    from snappydata_spark import get_spark
    from snappydata_spark.operators import (
        INDEX_SERVED,
        PREBUILDS,
        QUERIES,
        reset_build_once_sessions,
    )

    spark = get_spark("registry-scale-sweep")

    def _context_alive() -> bool:
        try:
            return not spark.sparkContext._jsc.sc().isStopped()
        except Exception:
            return False

    results: dict[str, dict] = {}
    # resume support: a partially-written artifact skips finished rows
    if os.path.exists(out_path):
        results = json.load(open(out_path))

    def _prebuild():
        """Force every build-once index session NOW, each timed as its
        own "_build_*" meta row — so a dependent query's row measures
        pure query wall regardless of run order or skip lists (r9
        verdict Wrong#2: the sf100 artifact charged the corpus_mh build
        to an unrelated query)."""
        for bname, bfn in PREBUILDS.items():
            t0 = time.time()
            try:
                bfn(spark, sf_dir)
                wall = round(time.time() - t0, 2)
                # keep the FIRST (real) build time across restarts; the
                # idempotent re-warm after a context restart is recorded
                # only if the original row is missing
                if bname not in results or "err" in results[bname]:
                    results[bname] = {"wall": wall, "build": True}
                print(f"{bname}: {wall}s", flush=True)
            except Exception as e:  # noqa: BLE001
                results[bname] = {
                    "wall": round(time.time() - t0, 2),
                    "err": f"{type(e).__name__}: {e}"[:300],
                    "build": True,
                }
                print(f"FAIL {bname}: {results[bname]['err'][:120]}", flush=True)
        # release builds' cached relations/broadcasts before the timed
        # rows: at rehearsal scale the storage pool they pin is exactly
        # the execution-memory headroom the heavy self-join queries need
        # (dedup_containment OOMed at sf100 with builds-first but passed
        # for r9's lazy build order, which reached it on a fresh heap)
        import gc

        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)

    # Standalone queries run FIRST on a fresh heap; the build-once index
    # sessions are forced (and timed as _build_* rows) only when the
    # first INDEX_SERVED query comes up — the live sessions pin JVM
    # memory the heavy standalone self-joins need (at sf100,
    # builds-first OOMed dedup_ngram_jaccard/containment, which pass in
    # r9's lazy order; this keeps that order WITH build attribution).
    prebuilt = False
    ordered = sorted(
        QUERIES.items(), key=lambda kv: (kv[0] in INDEX_SERVED, kv[0])
    )
    for name, fn in ordered:
        if name_filter and not any(name.startswith(f) for f in name_filter):
            continue
        if name in skip_names:
            continue
        if name in results and "err" not in results[name]:
            continue
        if name in INDEX_SERVED and not prebuilt:
            _prebuild()
            prebuilt = True
        # one retry on a fresh context: a fatal executor error from the
        # PREVIOUS query (e.g. a deliberately over-scale rehearsal row)
        # must not cascade into this one
        for attempt in (0, 1):
            load1 = round(os.getloadavg()[0], 1)
            t0 = time.time()
            try:
                n = fn(spark, sf_dir).count()
                results[name] = {
                    "wall": round(time.time() - t0, 2), "rows": int(n),
                    "load_before": load1,
                }
                print(f"{name}: {results[name]['wall']}s rows={n}", flush=True)
            except Exception as e:
                results[name] = {
                    "wall": round(time.time() - t0, 2),
                    "err": f"{type(e).__name__}: {e}"[:300],
                }
                print(f"FAIL {name}: {results[name]['err'][:120]}", flush=True)
            if _context_alive():
                spark.catalog.clearCache()
                # long single-JVM sweeps drift: dropped DataFrames are
                # py4j proxies whose JVM counterparts (plans, broadcasts,
                # shuffle registrations) free only when Python GC runs —
                # hours in, late queries measured 2-4x slower than the
                # same query in a fresh session.  Collect both sides and
                # give the async ContextCleaner a beat.
                import gc

                gc.collect()
                spark.sparkContext._jvm.System.gc()
                time.sleep(1.0)
                break
            print(f"-- SparkContext died during {name}; restarting", flush=True)
            try:
                # if the JVM/py4j gateway itself died (executor OOM kills
                # the whole local-mode JVM), stop() raises — the fresh
                # session below is all that matters
                spark.stop()
            except Exception:
                pass
            spark = get_spark("registry-scale-sweep")
            reset_build_once_sessions()
            if prebuilt:
                _prebuild()  # rebuild index sessions for the live context
            if "err" not in results[name]:
                break  # died but the result was already in; keep it
        tmp = out_path + ".tmp"
        json.dump(results, open(tmp, "w"), indent=1, sort_keys=True)
        os.replace(tmp, out_path)
    errs = [k for k, v in results.items() if "err" in v]
    print(json.dumps({
        "sf_dir": sf_dir, "queries": len(results), "errors": errs,
        "total_wall": round(sum(v["wall"] for v in results.values()), 1),
    }))


if __name__ == "__main__":
    main()
