#!/usr/bin/env python3
"""Wall-time the DuckDB oracle suite — the EXTERNAL denominator for
BASELINE.md next to the self-referential bench pin.

Usage: python3 tools/time_oracle.py [sf_dir] [oracle_sql.json] [timeout_s]

Runs every oracle SQL (from a prior `graft.Verify` dump; the SQL is
SF-independent) against the given testdata SF in DuckDB and reports
per-query and total wall seconds as one JSON line.

Caveats (read before comparing to bench.json):
  - DuckDB executes the ORACLE formulation, which is sometimes a
    different algorithm by design (recursive-CTE transitive closures
    where Spark runs frontier propagation; one-row invariant summaries
    for the MLlib-backed rows; fixed-size fixtures like the 200-point
    density queries).
  - Single-process, in-memory, no result parquet writes, no JVM/session
    overhead — a favorable setting for DuckDB.
  - Queries that exceed the per-query timeout are interrupted and
    reported as timeouts (excluded from the total, listed separately).
"""
import json, sys, threading, time

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLES = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out2/oracle_sql.json"
TIMEOUT = float(sys.argv[3]) if len(sys.argv) > 3 else 300.0
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracles = json.load(open(ORACLES))
    times, timeouts, errors = {}, [], []
    for name, sql in sorted(oracles.items()):
        # the timer checks `done` before interrupting: a timer that fires
        # in the window between fetchall() returning and cancel() must
        # not interrupt the connection (it would kill the NEXT query and
        # misreport it as a timeout)
        done = threading.Event()

        def interrupt_if_running():
            if not done.is_set():
                con.interrupt()

        timer = threading.Timer(TIMEOUT, interrupt_if_running)
        timer.start()
        t0 = time.monotonic()
        try:
            con.execute(sql).fetchall()
            times[name] = round(time.monotonic() - t0, 3)
        except duckdb.InterruptException:
            # an interrupt well before the timeout is a stray from the
            # race above, not a timeout — retry the query once, with a
            # FRESH timer armed (a retry that legitimately needs
            # interrupting must not run unbounded and stall the suite)
            if time.monotonic() - t0 < TIMEOUT * 0.9:
                done.set(); timer.cancel()
                done = threading.Event()
                retry_done = done

                def interrupt_retry():
                    if not retry_done.is_set():
                        con.interrupt()

                timer = threading.Timer(TIMEOUT, interrupt_retry)
                timer.start()
                t0 = time.monotonic()
                try:
                    con.execute(sql).fetchall()
                    times[name] = round(time.monotonic() - t0, 3)
                except duckdb.InterruptException:
                    timeouts.append(name)
                except Exception as e:
                    errors.append(f"{name}: {type(e).__name__}")
            else:
                timeouts.append(name)
        except Exception as e:
            errors.append(f"{name}: {type(e).__name__}")
        finally:
            done.set()
            timer.cancel()
        dt = time.monotonic() - t0
        print(f"{name:40s} {dt:8.2f}s"
              + ("  TIMEOUT" if name in timeouts else "")
              + ("  ERROR" if any(x.startswith(name) for x in errors) else ""),
              file=sys.stderr)
    total = round(sum(times.values()), 1)
    print(json.dumps({
        "metric": "duckdb_oracle_suite", "sf": SF, "timeout_s": TIMEOUT,
        "queries_timed": len(times), "total_s": total,
        "timeouts": timeouts, "errors": errors,
        "queries": times}))


if __name__ == "__main__":
    main()
