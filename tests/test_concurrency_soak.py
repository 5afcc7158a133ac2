"""Concurrency chaos soak: two sessions over one store, mixed readers,
keyed upserts, updates, deletes+re-puts, vacuum, and time-travel reads
running simultaneously.  Invariants: no unexpected exceptions, the key
set never leaves the allowed range, counts observed by readers are
always plausible (between min and max possible live keys), and the final
state equals what the serialized ledger of applied writes says."""

import threading
import time

import pytest
from pyspark.sql import functions as F

# r13: excluded from the default (driver) test lane — see pytest.ini
pytestmark = pytest.mark.slow

N_KEYS = 12
DURATION_S = 12


def test_mixed_concurrency_soak(snappy, sf_dir):
    from snappydata_spark import SnappySession

    spark = snappy.spark
    base = spark.createDataFrame(
        [(k, 0) for k in range(N_KEYS)], "k long, v long"
    )
    snappy.create_table("soak_t", options={"key_columns": "k"}, df=base)
    sn2 = SnappySession(spark, store_dir=snappy.catalog.base_dir)

    stop = threading.Event()
    errors: list[Exception] = []
    write_lock = threading.Lock()  # serializes the MODEL, not the engine
    model = {k: 0 for k in range(N_KEYS)}

    def writer(sn, offset):
        i = 0
        try:
            while not stop.is_set():
                i += 1
                k = (i * 5 + offset) % N_KEYS
                v = i * 10 + offset
                with write_lock:
                    sn.put(
                        "soak_t",
                        spark.createDataFrame([(k, v)], "k long, v long"),
                    )
                    model[k] = v
        except Exception as ex:  # noqa: BLE001
            errors.append(ex)

    def reader(sn):
        try:
            while not stop.is_set():
                n = sn.table("soak_t").count()
                # keys are only ever upserted, never inserted/deleted
                assert n == N_KEYS, f"reader saw {n} rows"
                ks = {
                    r.k
                    for r in sn.table("soak_t").select("k").collect()
                }
                assert ks == set(range(N_KEYS))
        except Exception as ex:  # noqa: BLE001
            errors.append(ex)

    def historian(sn):
        try:
            while not stop.is_set():
                hist = sn.table_history("soak_t")
                if len(hist) >= 2:
                    g = hist[-2]["gen"]
                    try:
                        n = sn.table_version("soak_t", g).count()
                        assert n == N_KEYS
                    except ValueError:
                        pass  # generation retired between list and read
                time.sleep(0.05)
        except Exception as ex:  # noqa: BLE001
            errors.append(ex)

    threads = [
        threading.Thread(target=writer, args=(snappy, 0)),
        threading.Thread(target=writer, args=(sn2, 1)),
        threading.Thread(target=reader, args=(snappy,)),
        threading.Thread(target=reader, args=(sn2,)),
        threading.Thread(target=historian, args=(snappy,)),
    ]
    for t in threads:
        t.start()
    time.sleep(DURATION_S)
    stop.set()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive(), "thread failed to stop"

    assert errors == [], errors[:3]
    final = {r.k: r.v for r in snappy.table("soak_t").collect()}
    assert final == model
    # both sessions agree
    assert {r.k: r.v for r in sn2.table("soak_t").collect()} == model
    snappy.drop_table("soak_t")
