"""Ad-hoc dev harness: verify-style compare for named qids at a given SF.

Usage: python tests/_check_new.py f14_fn_interval [qid...] [--sf 0.01]
Not a pytest module (leading underscore); the permanent gate is
tests/test_registry_oracle.py, which sweeps every registered spec.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import SparkSession

from scylladb_redpanda_cdc_spark.plans import registry


def main() -> None:
    argv = sys.argv[1:]
    sf = "0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = argv
    sf_dir = f"/root/testdata/sf{sf}"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    specs = registry()
    bad = 0
    for qid in args:
        spec = specs[qid]
        pdf = spec.build(spark, sf_dir).toPandas()
        if spec.oracle is None:
            print(f"{qid}: rows-only ({len(pdf)})")
            continue
        odf = con.sql(spec.oracle).df()
        cols_ok = sorted(pdf.columns) == sorted(odf.columns)
        a = sorted(map(str, pdf.reindex(sorted(pdf.columns), axis=1).itertuples(index=False, name=None)))
        b = sorted(map(str, odf.reindex(sorted(odf.columns), axis=1).itertuples(index=False, name=None)))
        ok = cols_ok and a == b
        print(f"{qid}: {'OK' if ok else 'MISMATCH'} rows={len(pdf)}/{len(odf)} cols_ok={cols_ok}")
        if not ok:
            bad += 1
            if not cols_ok:
                print("  spark cols:", sorted(pdf.columns))
                print("  oracle cols:", sorted(odf.columns))
            diff_a = [x for x in a if x not in set(b)][:3]
            diff_b = [x for x in b if x not in set(a)][:3]
            print("  spark-only:", diff_a)
            print("  oracle-only:", diff_b)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
